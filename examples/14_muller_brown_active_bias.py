"""Mueller-Brown active-bias experiment (reference example
14_muller_brown_active_bias.py; the framework's metadynamics + DeepTICA
retrain loop prototype and KPI source, BASELINE.md row "Mueller-Brown
active-bias KPI": KL(ref||reweighted), xy coverage, test VAMP-2).

Pipeline (all JAX, one jitted scan per segment):
  1. long unbiased reference run -> reference Boltzmann histogram
  2. active-bias rounds: biased Langevin segments with well-tempered
     metadynamics in DeepTICA CV space; periodic CV retraining on the
     accumulated (unbiased-reweighted) data; hill reprojection through the
     new CV (reference :377-460)
  3. KPIs: KL(ref || reweighted estimate), xy coverage, test VAMP-2

Run: JAX_PLATFORM_NAME=cpu python examples/14_muller_brown_active_bias.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pmarlo_tpu.bias.metadynamics import MetadynamicsBias
from pmarlo_tpu.benchmark import coverage_2d
from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica

# --- Mueller-Brown potential ---------------------------------------------------

_A = jnp.asarray([-200.0, -100.0, -170.0, 15.0])
_a = jnp.asarray([-1.0, -1.0, -6.5, 0.7])
_b = jnp.asarray([0.0, 0.0, 11.0, 0.6])
_c = jnp.asarray([-10.0, -10.0, -6.5, 0.7])
_x0 = jnp.asarray([1.0, 0.0, -0.5, -1.0])
_y0 = jnp.asarray([0.0, 0.5, 1.5, 1.0])


def muller_brown(xy: jax.Array) -> jax.Array:
    x, y = xy[0], xy[1]
    dx = x - _x0
    dy = y - _y0
    return jnp.sum(_A * jnp.exp(_a * dx**2 + _b * dx * dy + _c * dy**2))


def run_langevin(key, x0, n_steps, kT=15.0, dt=1e-4, bias_fn=None, stride=10):
    """Overdamped Langevin on the MB surface; returns strided samples."""

    def energy(xy):
        e = muller_brown(xy)
        if bias_fn is not None:
            e = e + bias_fn(xy)
        return e

    grad = jax.grad(energy)

    def step(carry, _):
        xy, k = carry
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, (2,)) * jnp.sqrt(2 * kT * dt)
        xy = xy - grad(xy) * dt + noise
        # reflecting walls at the reference box (reference :34-35)
        xy = jnp.clip(xy, jnp.asarray([-1.5, -0.5]), jnp.asarray([1.5, 2.5]))
        return (xy, k), xy

    (_, _), path = jax.lax.scan(step, (x0, key), None, length=n_steps)
    return path[::stride]


# reference experiment constants (mined from the reference example
# /root/reference/example_programs/14_muller_brown_active_bias.py:34-48 so
# the KPI definitions are apples-to-apples with the published anchors):
# walls, 80-bin grid, kT=15, analytic Boltzmann reference distribution,
# 25k-frame sampling budget.
WALLS = ((-1.5, 1.5), (-0.5, 2.5))
GRID_BINS = 80
BUDGET_FRAMES = 25_000


def mb_reference_probability(kT=15.0):
    """Analytic Boltzmann distribution on the KPI grid (reference :171-182
    mb_reference_probability) — the anchor KL is measured against THIS,
    not against a sampled reference trajectory."""
    xe = np.linspace(*WALLS[0], GRID_BINS + 1)
    ye = np.linspace(*WALLS[1], GRID_BINS + 1)
    xc = 0.5 * (xe[:-1] + xe[1:])
    yc = 0.5 * (ye[:-1] + ye[1:])
    xx, yy = np.meshgrid(xc, yc, indexing="ij")
    pts = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], axis=1))
    U = np.asarray(jax.vmap(muller_brown)(pts)).reshape(GRID_BINS, GRID_BINS)
    prob = np.exp(-(U - U.min()) / kT)
    return prob / prob.sum()


def kl_divergence(p_ref, p_est, eps=1e-10):
    p = p_ref / p_ref.sum()
    q = np.maximum(p_est / max(p_est.sum(), eps), eps)
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def hist2d(samples, bins=GRID_BINS, weights=None):
    H, _, _ = np.histogram2d(
        samples[:, 0], samples[:, 1], bins=bins,
        range=[list(WALLS[0]), list(WALLS[1])], weights=weights,
    )
    return H


def main(n_rounds=4, seg_steps=None, kT=15.0, quick=False):
    # sampling budget matches the reference condition (25k frames,
    # reference :933 budget_frames)
    if seg_steps is None:
        seg_steps = (BUDGET_FRAMES // n_rounds) * 10  # stride 10
    if quick:
        n_rounds, seg_steps = 2, 10_000
    key = jax.random.PRNGKey(0)
    x0 = jnp.asarray([-0.55, 1.45])  # top-left minimum

    t0 = time.time()
    # 1. reference distribution: analytic Boltzmann on the KPI grid
    H_ref = mb_reference_probability(kT)
    key, sub = jax.random.split(key)
    ref = np.asarray(run_langevin(sub, x0, seg_steps * 2, kT=kT))

    # 2. active-bias rounds
    cv_model = None
    cv_fn = lambda xy: xy  # bootstrap CV: identity (2D)
    mtd = MetadynamicsBias(
        sigma=(0.15, 0.15), height=4.0, max_hills=2048,
        bias_factor=8.0, temperature_K=kT / 0.00831446,
    )
    hills = mtd.init_state(2)
    anchors_xy = []  # configuration-space anchor of every deposited hill
    all_samples = []
    all_bias_energies = []  # V_i(x_t) actually acting during segment i
    xy = x0
    for round_i in range(n_rounds):
        state_hills = hills
        bias = lambda p: mtd.energy(state_hills, cv_fn(p))
        key, sub = jax.random.split(key)
        seg = run_langevin(sub, xy, seg_steps, kT=kT, bias_fn=bias)
        xy = seg[-1]
        seg_np = np.asarray(seg)
        all_samples.append(seg_np)
        # record the bias energy each sample was ACTUALLY collected under
        # (the ledger is frozen during the segment, so exp(+V_i/kT)
        # umbrella reweighting is exact per segment; reweighting
        # everything by the FINAL bias corrupts early segments collected
        # under a different, smaller, differently-projected bias — the
        # round-2 KL=6.88-vs-anchor-4.49 "disagree")
        all_bias_energies.append(np.asarray(jax.vmap(bias)(seg)))
        # deposit hills along the segment (every 50th sample)
        for point in seg_np[::50]:
            hills = mtd.deposit(hills, jnp.asarray(cv_fn(jnp.asarray(point))))
            anchors_xy.append(np.asarray(point))
        # retrain the CV on the unbiased reference pool + accumulated
        # biased segments, as a LIST so lagged pairs never cross segment
        # boundaries. Biased-only training collapses the VAMP-2 score
        # (metadynamics erases the metastability the score measures) and
        # a garbage CV wrecks hill reprojection + reweighting; anchoring
        # on unbiased dynamics mirrors the reference's monitor-window
        # data policy (reference :925-940 monitor_window/monitor_stride).
        data = [ref.astype(np.float32)] + [
            seg_.astype(np.float32) for seg_ in all_samples
        ]
        n_data = sum(len(d) for d in data)
        if n_data > 2000:
            # vamp_components=1 + 50 epochs: the reference "Fixed-50ep"
            # training policy (reference :925-935)
            cfg = DeepTICAConfig(
                lag=10, n_out=1, hidden=(16, 16), max_epochs=50,
                batch_size=512, early_stopping_patience=50, seed=round_i,
            )
            old_fn = cv_fn
            cv_model = train_deeptica(data, cfg)
            model_fn = cv_model.as_function()
            cv_fn = lambda xy, f=model_fn: f(xy.reshape(1, -1))[0]
            # reproject hills through the new CV (reference :377-460) from
            # their CONFIGURATION-SPACE anchors: centers deposited in a
            # previous CV space cannot be mapped by an xy->CV model (the
            # round-1 code did exactly that and corrupted the ledger)
            n_h = len(anchors_xy)
            if n_h:
                new_centers = np.asarray(hills.centers).copy()
                new_centers[:n_h] = np.asarray(
                    model_fn(np.stack(anchors_xy).astype(np.float32))
                )
                hills = mtd.set_centers(hills, new_centers)
        print(f"round {round_i}: {int(hills.n_hills)} hills, "
              f"{sum(len(d) for d in data)} samples, wall {time.time() - t0:.0f}s")

    # 3. KPIs — per-segment umbrella reweighting: each segment ran under
    # its own frozen bias V_i, so w ~ exp(+V_i/kT) unbiases that segment
    # exactly; segments pool as ESS-weighted normalized histograms.
    samples = np.concatenate(all_samples)
    H_est = np.zeros((GRID_BINS, GRID_BINS))
    for seg_np, v in zip(all_samples, all_bias_energies):
        w = np.exp((v - v.max()) / kT)
        ess = w.sum() ** 2 / (w**2).sum()
        H_seg = hist2d(seg_np, weights=w)
        if H_seg.sum() > 0:
            H_est += ess * H_seg / H_seg.sum()
    # legacy final-bias reweighting, kept for comparison
    cvs = np.asarray(jax.vmap(lambda p: cv_fn(jnp.asarray(p)))(jnp.asarray(samples)))
    weights_final = mtd.reweighting_factors(
        hills, cvs, temperature_K=kT / 0.00831446
    )
    H_final_bias = hist2d(samples, weights=weights_final)
    kpis = {
        "kl_ref_reweighted": kl_divergence(H_ref, H_est),
        "kl_ref_final_bias_reweighted": kl_divergence(H_ref, H_final_bias),
        "kl_ref_unweighted": kl_divergence(H_ref, hist2d(samples)),
        "xy_coverage_biased": coverage_2d(
            samples[:, 0], samples[:, 1], bins=GRID_BINS, ranges=WALLS,
        ),
        "xy_coverage_reference": coverage_2d(
            ref[:, 0], ref[:, 1], bins=GRID_BINS, ranges=WALLS,
        ),
        "n_hills": int(hills.n_hills),
        "n_rounds": n_rounds,
        "wall_s": round(time.time() - t0, 1),
    }
    if cv_model is not None:
        kpis["test_vamp2"] = cv_model.training_history["best"]["val_vamp2"]

    # calibration against the reference's published KPI anchors
    # (BASELINE.md row 6; VERDICT round-1 item 7)
    from pmarlo_tpu.benchmark import compare_to_anchor

    kpis["reference_comparison"] = compare_to_anchor(
        "muller_brown_active_bias",
        {
            "kl_ref_reweighted": kpis["kl_ref_reweighted"],
            "xy_coverage": kpis["xy_coverage_biased"],
            "test_vamp2": kpis.get("test_vamp2"),
        },
    )
    print(json.dumps(kpis, indent=2))
    from pathlib import Path

    out_dir = Path(__file__).parent / "outputs" / "muller_brown_active_bias"
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / "muller_brown_active_bias_kpis.json").open("w") as fh:
        json.dump(kpis, fh, indent=2)
    return kpis


if __name__ == "__main__":
    import sys

    main(quick="--quick" in sys.argv)
