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
        xy = jnp.clip(xy, -2.0, 2.5)
        return (xy, k), xy

    (_, _), path = jax.lax.scan(step, (x0, key), None, length=n_steps)
    return path[::stride]


def kl_divergence(p_ref, p_est, eps=1e-10):
    p = p_ref / p_ref.sum()
    q = np.maximum(p_est / max(p_est.sum(), eps), eps)
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def hist2d(samples, bins=32, weights=None):
    H, _, _ = np.histogram2d(
        samples[:, 0], samples[:, 1], bins=bins,
        range=[[-2.0, 1.5], [-0.5, 2.5]], weights=weights,
    )
    return H


def main(n_rounds=4, seg_steps=40_000, kT=15.0, quick=False):
    if quick:
        n_rounds, seg_steps = 2, 10_000
    key = jax.random.PRNGKey(0)
    x0 = jnp.asarray([-0.55, 1.45])  # top-left minimum

    t0 = time.time()
    # 1. reference: long unbiased run
    key, sub = jax.random.split(key)
    ref = np.asarray(run_langevin(sub, x0, seg_steps * 8, kT=kT))
    H_ref = hist2d(ref)

    # 2. active-bias rounds
    cv_model = None
    cv_fn = lambda xy: xy  # bootstrap CV: identity (2D)
    mtd = MetadynamicsBias(
        sigma=(0.15, 0.15), height=4.0, max_hills=2048,
        bias_factor=8.0, temperature_K=kT / 0.00831446,
    )
    hills = mtd.init_state(2)
    all_samples = []
    xy = x0
    for round_i in range(n_rounds):
        state_hills = hills
        bias = lambda p: mtd.energy(state_hills, cv_fn(p))
        key, sub = jax.random.split(key)
        seg = run_langevin(sub, xy, seg_steps, kT=kT, bias_fn=bias)
        xy = seg[-1]
        seg_np = np.asarray(seg)
        all_samples.append(seg_np)
        # deposit hills along the segment (every 50th sample)
        for point in seg_np[::50]:
            hills = mtd.deposit(hills, jnp.asarray(cv_fn(jnp.asarray(point))))
        # retrain the CV on accumulated data
        data = np.concatenate(all_samples).astype(np.float32)
        if len(data) > 2000:
            cfg = DeepTICAConfig(
                lag=10, n_out=2, hidden=(16, 16), max_epochs=10,
                batch_size=512, early_stopping_patience=5, seed=round_i,
            )
            old_fn = cv_fn
            cv_model = train_deeptica(data, cfg)
            model_fn = cv_model.as_function()
            cv_fn = lambda xy, f=model_fn: f(xy.reshape(1, -1))[0]
            # reproject hills through the new CV (reference :377-460):
            # hill centers were in old-CV space == xy space bootstrap; we
            # reproject by mapping stored centers through the new model.
            hills = mtd.reproject(
                hills, lambda c, f=model_fn: f(c.reshape(1, -1))[0]
            )
        print(f"round {round_i}: {int(hills.n_hills)} hills, "
              f"{len(data)} samples, wall {time.time() - t0:.0f}s")

    # 3. KPIs
    samples = np.concatenate(all_samples)
    cvs = np.asarray(jax.vmap(lambda p: cv_fn(jnp.asarray(p)))(jnp.asarray(samples)))
    weights = mtd.reweighting_factors(hills, cvs, temperature_K=kT / 0.00831446)
    H_est = hist2d(samples, weights=weights)
    kpis = {
        "kl_ref_reweighted": kl_divergence(H_ref, H_est),
        "kl_ref_unweighted": kl_divergence(H_ref, hist2d(samples)),
        "xy_coverage_biased": coverage_2d(
            samples[:, 0], samples[:, 1],
            ranges=((-2.0, 1.5), (-0.5, 2.5)),
        ),
        "xy_coverage_reference": coverage_2d(
            ref[:, 0], ref[:, 1], ranges=((-2.0, 1.5), (-0.5, 2.5)),
        ),
        "n_hills": int(hills.n_hills),
        "n_rounds": n_rounds,
        "wall_s": round(time.time() - t0, 1),
    }
    if cv_model is not None:
        kpis["test_vamp2"] = cv_model.training_history["best"]["val_vamp2"]
    print(json.dumps(kpis, indent=2))
    return kpis


if __name__ == "__main__":
    import sys

    main(quick="--quick" in sys.argv)
