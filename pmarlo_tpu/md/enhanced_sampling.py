"""Fused enhanced sampling: well-tempered metadynamics at kernel speed.

Combines the multi-step Pallas kernel (with the in-kernel DeepTICA CV +
hills-ledger bias, md/pallas_md.py) with host-side hill deposition between
windows. The hills ledger travels as RUNTIME kernel inputs, so deposits
never trigger recompilation — the reference's active-bias loop
(example 14) with the per-step cost of the fused kernel.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bias.metadynamics import MetadynamicsBias, MetaDState
from .pallas_md import build_pallas_chunk
from .system import System


def run_fused_metadynamics(
    system: System,
    positions: jax.Array,
    *,
    cv_model,
    cv_quads: np.ndarray,
    mtd: MetadynamicsBias,
    n_steps: int,
    deposit_interval: int = 500,
    n_replicas: int = 1,
    temperature_K: float = 300.0,
    dt_ps: float = 0.002,
    friction_per_ps: float = 1.0,
    seed: int = 0,
    hills: Optional[MetaDState] = None,
) -> Dict:
    """Run metadynamics with the bias fused into the Pallas MD kernel.

    Each window advances ``deposit_interval`` steps in ONE kernel launch,
    then a hill is deposited at every replica's current CV (well-tempered
    damping handled by the MetadynamicsBias config). Returns dict with the
    final state, hills ledger, and the per-window CV trace (W, R, n_cv).
    """
    if n_steps % deposit_interval != 0:
        raise ValueError("n_steps must be a multiple of deposit_interval")
    from ..bias.harmonic import make_feature_cv_fn, make_phi_psi_feature_fn

    chunk = build_pallas_chunk(
        system,
        dt=dt_ps,
        friction=friction_per_ps,
        n_steps=deposit_interval,
        n_replicas=n_replicas,
        bias_model=cv_model,
        bias_quads=cv_quads,
        bias_kind="metadynamics",
        mtd_sigma=np.asarray(mtd.sigma),
    )
    n_cv = len(mtd.sigma)
    if hills is None:
        hills = mtd.init_state(n_cv)

    # XLA-side CV evaluation for deposits (once per window, negligible)
    model_fn = cv_model.as_function()
    quads_j = jnp.asarray(cv_quads)

    @jax.jit
    def cv_of(positions_batch):
        from .forces import dihedral_angles

        def one(x):
            ang = dihedral_angles(x, quads_j)
            feats = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)])
            return model_fn(feats.reshape(1, -1))[0]

        return jax.vmap(one)(positions_batch)

    R = n_replicas
    x = jnp.broadcast_to(positions[None], (R,) + positions.shape)
    v = jnp.zeros_like(x)
    key = jax.random.PRNGKey(seed)
    temps = jnp.full((R,), float(temperature_K), jnp.float32)
    cv_trace = []
    n_windows = n_steps // deposit_interval
    for w in range(n_windows):
        seeds = jax.random.randint(
            jax.random.fold_in(key, w), (R,), 0, 2**31 - 1, dtype=jnp.int32
        )
        mask = (
            jnp.arange(mtd.max_hills) < hills.n_hills
        ).astype(jnp.float32)[None, :]
        x, v, _ = chunk(
            x, v, seeds, temps,
            hills.centers, hills.heights[None, :], mask,
        )
        cvs = cv_of(x)                               # (R, n_cv)
        cv_trace.append(np.asarray(cvs))
        for r in range(R):
            hills = mtd.deposit(hills, cvs[r])
    return {
        "positions": x,
        "velocities": v,
        "hills": hills,
        "cv_trace": np.asarray(cv_trace),
        "n_windows": n_windows,
    }


__all__ = ["run_fused_metadynamics"]
