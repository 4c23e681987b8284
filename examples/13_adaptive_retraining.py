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
    """One (schedule, window) condition: BIASED segments (the reference
    replay carries a Gaussian bias ledger — hills deposited along the
    stream, estimates reweighted at collection time; notebook section 6),
    periodic CV retraining on the chosen data window, KPIs at the end.

    The final density estimate uses per-segment umbrella reweighting
    (each segment ran under its own frozen ledger state), pooled by ESS —
    the same estimator as example 14."""
    import jax.numpy as jnp

    from pmarlo_tpu.bias.metadynamics import MetadynamicsBias

    x0 = jnp.asarray([-0.55, 1.45])
    mtd = MetadynamicsBias(
        sigma=(0.15, 0.15), height=4.0, max_hills=2048,
        bias_factor=8.0, temperature_K=kT / 0.00831446,
    )
    hills = mtd.init_state(2)
    samples, bias_energies, vamp_scores = [], [], []
    xy = x0
    for r in range(n_rounds):
        state_hills = hills
        bias = lambda p: mtd.energy(state_hills, p)
        key, sub = jax.random.split(key)
        seg = mb.run_langevin(sub, xy, seg_steps, kT=kT, bias_fn=bias)
        xy = seg[-1]
        seg_np = np.asarray(seg)
        samples.append(seg_np)
        bias_energies.append(np.asarray(jax.vmap(bias)(seg)))
        # hill deposits along the stream (reference HILL_STRIDE cadence)
        for point in seg_np[::50]:
            hills = mtd.deposit(hills, jnp.asarray(point))
        # training window policy (reference: Fixed-T / Window-W / Reweighted)
        if window == "all":
            data = np.concatenate(samples)
        elif window in ("window", "reweighted"):
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
    # per-segment reweighted density (collection-time bias, exact per
    # segment because the ledger is frozen while a segment runs)
    H_est = np.zeros_like(ref_hist, dtype=np.float64)
    for seg_np, v in zip(samples, bias_energies):
        w = np.exp((v - v.max()) / kT)
        ess = w.sum() ** 2 / (w**2).sum()
        H_seg = mb.hist2d(seg_np, weights=w)
        if H_seg.sum() > 0:
            H_est += ess * H_seg / H_seg.sum()
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
    for window in ("all", "window", "reweighted"):
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
