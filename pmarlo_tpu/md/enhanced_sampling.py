"""Fused enhanced sampling: well-tempered metadynamics at kernel speed.

The ENTIRE metadynamics run — MD steps, CV evaluation, well-tempered hill
deposition — executes inside one Pallas kernel launch
(md/pallas_md.py fully-fused mode): the hills ledger lives in the kernel's
loop carry and the updated ledger returns as an output. This is the
reference's active-bias loop (example 14) with zero host round-trips per
deposit; on tunneled devices that removes ~100 ms of RPC per window.
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
    chunk=None,
) -> Dict:
    """Run metadynamics with MD, CV, and hill deposition fused into a
    single kernel launch.

    Every ``deposit_interval`` steps each replica deposits one
    (well-tempered) hill at its current DeepTICA CV. Returns the final
    state and the updated hills ledger.
    """
    if n_steps % deposit_interval != 0:
        raise ValueError("n_steps must be a multiple of deposit_interval")
    # reuse a previously-built chunk (result["chunk"]) — rebuilding means a
    # full recompile per call
    chunk = chunk or build_pallas_chunk(
        system,
        dt=dt_ps,
        friction=friction_per_ps,
        n_steps=n_steps,
        n_replicas=n_replicas,
        bias_model=cv_model,
        bias_quads=cv_quads,
        bias_kind="metadynamics",
        mtd_sigma=np.asarray(mtd.sigma),
        mtd_deposit_interval=deposit_interval,
        mtd_height=float(mtd.height),
        mtd_bias_factor=mtd.bias_factor,
        mtd_temperature_K=float(mtd.temperature_K),
    )
    n_cv = len(mtd.sigma)
    if hills is None:
        hills = mtd.init_state(n_cv)

    R = n_replicas
    x = jnp.broadcast_to(positions[None], (R,) + positions.shape)
    v = jnp.zeros_like(x)
    seeds = jax.random.randint(
        jax.random.PRNGKey(seed), (R,), 0, 2**31 - 1, dtype=jnp.int32
    )
    temps = jnp.full((R,), float(temperature_K), jnp.float32)
    centers_t0 = jnp.asarray(hills.centers).T                  # (n_cv, H)
    heights0 = jnp.asarray(hills.heights)[None, :]             # (1, H)
    count0 = jnp.asarray(
        [[float(hills.n_hills)]], jnp.float32
    )

    x, v, energies, centers_t, heights, count = chunk(
        x, v, seeds, temps, centers_t0, heights0, count0
    )
    final_hills = MetaDState(
        centers=centers_t.T,
        heights=heights[0],
        n_hills=jnp.asarray(count[0, 0], jnp.int32),
    )
    return {
        "positions": x,
        "velocities": v,
        "potential_energy": energies,
        "hills": final_hills,
        "n_windows": n_steps // deposit_interval,
        "chunk": chunk,
    }


__all__ = ["run_fused_metadynamics"]
