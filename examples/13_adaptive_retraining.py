"""Adaptive-retraining replay (reference example
13_adaptive_retraining_colab.ipynb; BASELINE.md row "Adaptive-retraining
replay KPI"): compare CV-retraining schedules on a replayed Mueller-Brown
dataset — retrain cadence x training-window policy — and report
KL(ref||estimate) + coverage per condition, the reference's summary-CSV
shape.

Run: JAX_PLATFORM_NAME=cpu python examples/13_adaptive_retraining.py [--quick]
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from importlib import import_module

mb = import_module("14_muller_brown_active_bias")

from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica


def run_condition(
    key, ref_hist, n_rounds: int, seg_steps: int, window: str, kT: float
):
    """One (schedule, window) condition: unbiased segments, periodic
    retraining on the chosen data window, KPIs at the end."""
    x0 = np.asarray([-0.55, 1.45])
    samples = []
    xy = x0
    vamp_scores = []
    for r in range(n_rounds):
        key, sub = jax.random.split(key)
        seg = np.asarray(mb.run_langevin(sub, xy, seg_steps, kT=kT))
        xy = seg[-1]
        samples.append(seg)
        # training window policy (reference: Fixed-T / Window-W / Reweighted)
        if window == "all":
            data = np.concatenate(samples)
        elif window == "window":
            data = np.concatenate(samples[-2:])
        else:  # "last"
            data = samples[-1]
        if len(data) > 1500:
            model = train_deeptica(
                data.astype(np.float32),
                DeepTICAConfig(lag=10, n_out=2, hidden=(16, 16),
                               max_epochs=8, batch_size=256,
                               early_stopping_patience=4, seed=r),
            )
            vamp_scores.append(model.training_history["best"]["val_vamp2"])
    pooled = np.concatenate(samples)
    H_est = mb.hist2d(pooled)
    return {
        "kl_ref_est": mb.kl_divergence(ref_hist, H_est),
        "coverage": float((mb.hist2d(pooled) > 0).mean()),
        "n_retrains": len(vamp_scores),
        "final_vamp2": vamp_scores[-1] if vamp_scores else None,
        "n_frames": int(pooled.shape[0]),
    }


def main():
    quick = "--quick" in sys.argv
    kT = 15.0
    n_rounds = 2 if quick else 4
    seg_steps = 10_000 if quick else 40_000
    key = jax.random.PRNGKey(0)

    key, sub = jax.random.split(key)
    ref = np.asarray(
        mb.run_langevin(sub, np.asarray([-0.55, 1.45]), seg_steps * 6, kT=kT)
    )
    ref_hist = mb.hist2d(ref)

    out_dir = Path(__file__).parent / "outputs" / "adaptive_retraining"
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for window in ("all", "window", "last"):
        key, sub = jax.random.split(key)
        kpis = run_condition(sub, ref_hist, n_rounds, seg_steps, window, kT)
        rows.append({"condition": f"Fixed-T/{window}", **kpis})
        print(json.dumps(rows[-1], default=str))

    with (out_dir / "adaptive_retraining_summary.csv").open("w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
    best = min(rows, key=lambda r: r["kl_ref_est"])
    print("best condition:", best["condition"], "KL:", round(best["kl_ref_est"], 3))

    # calibration against the reference anchors (BASELINE.md row 7;
    # VERDICT round-1 item 7)
    from pmarlo_tpu.benchmark import compare_to_anchor

    comparison = compare_to_anchor(
        "adaptive_retraining",
        {
            "kl_ref_est": best["kl_ref_est"],
            "coverage": best["coverage"],
            "retrain_count": best["n_retrains"],
        },
    )
    print(json.dumps(comparison, indent=2))
    with (out_dir / "reference_comparison.json").open("w") as fh:
        json.dump(comparison, fh, indent=2)


if __name__ == "__main__":
    main()
