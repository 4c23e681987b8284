"""Tiled Pallas kernel for the explicit-solvent periodic pair stage.

Single-sweep sibling of md/pallas_pair.py (the GB kernel needs three
sweeps because Born radii couple all pairs; the periodic LJ +
reaction-field potential has no such coupling, so energy AND forces
come out of one pass over the (TI, N) pair block):

  per row tile: min-image distances against the full coordinate row,
  LJ (potential-shifted at the cutoff) + reaction-field Coulomb with
  OpenMM CutoffPeriodic semantics (md/forces.py periodic_nonbonded_energy
  is the XLA reference implementation), exclusion scale tiles STREAMED
  from HBM (measured faster than sparse corrections — see the design
  note in md/pallas_pair.py).

XLA glue adds the bonded terms via jax.value_and_grad exactly as the GB
kernel does. Validation: tests/unit/test_pallas_periodic.py checks
energy/force parity against the XLA path in interpret mode and the
force consistency d(energy) = -F . dx.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
from .forces import lj_switch
from .system import System

_EPS = 1e-12


def build_periodic_force_fn(
    system: System,
    *,
    tile: int = 256,
    interpret: bool = False,
) -> Callable:
    """Jitted ``fn(x (N,3)) -> (energy, forces (N,3))`` for the FULL
    periodic potential (tiled pair kernel + XLA bonded terms)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if system.box is None:
        raise ValueError("build_periodic_force_fn needs system.box")
    if getattr(system, "tilt", None) is not None:
        raise ValueError(
            "the dense periodic sweep is orthorhombic-only (per-axis "
            "minimum image on the box diagonal); triclinic cells need "
            "the cell-list engine (build_cell_force_fn)"
        )
    if tile % 128 != 0:
        raise ValueError("tile must be a multiple of 128 (lane blocking)")

    n_real = system.n_atoms
    N = ((n_real + tile - 1) // tile) * tile
    GRID = N // tile
    pad = N - n_real

    def padded(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                      constant_values=fill)

    q = padded(system.charges)
    sig = padded(system.lj_sigma)
    # sqrt(eps) at the source: the Lorentz-Berthelot geometric
    # mean becomes an in-kernel multiply (one less per-pair sqrt)
    eps = np.sqrt(padded(system.lj_eps))
    mask = np.zeros(N, np.float32)
    mask[:n_real] = 1.0

    se_full = np.ones((N, N), np.float32)
    sl_full = np.ones((N, N), np.float32)
    from .system import require_dense_scales

    require_dense_scales(system, "the dense periodic kernel")
    se_full[:n_real, :n_real] = np.asarray(system.scale_elec, np.float32)
    sl_full[:n_real, :n_real] = np.asarray(system.scale_lj, np.float32)
    # padded slots must not interact
    se_full[n_real:, :] = 0.0
    se_full[:, n_real:] = 0.0
    sl_full[n_real:, :] = 0.0
    sl_full[:, n_real:] = 0.0

    bx, by, bz = (float(b) for b in system.box)
    rc = float(system.cutoff)
    switch_d = (None if system.switch_distance is None
                else float(system.switch_distance))
    eps_rf = float(system.solvent_dielectric)
    k_rf = (eps_rf - 1.0) / ((2.0 * eps_rf + 1.0) * rc**3)
    c_rf = 1.0 / rc + k_rf * rc * rc
    ke = COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 / float(system.solute_dielectric)

    def kernel(xi_ref, xf_ref, q_i_ref, q_j_ref, sig_i_ref, sig_j_ref,
               eps_i_ref, eps_j_ref, se_ref, sl_ref, mask_i_ref,
               mask_j_ref, e_ref, F_ref):
        xi = xi_ref[...]                       # (TI, 3)
        xf = xf_ref[...]                       # (3, N)
        dd0 = xi[:, 0:1] - xf[0:1, :]
        dd1 = xi[:, 1:2] - xf[1:2, :]
        dd2 = xi[:, 2:3] - xf[2:3, :]
        # minimum image per component (orthorhombic)
        dd0 = dd0 - bx * jnp.round(dd0 * (1.0 / bx))
        dd1 = dd1 - by * jnp.round(dd1 * (1.0 / by))
        dd2 = dd2 - bz * jnp.round(dd2 * (1.0 / bz))
        r2 = dd0 * dd0 + dd1 * dd1 + dd2 * dd2
        not_self = (r2 > 1e-8).astype(xi.dtype)
        r = jnp.where(r2 > 1e-8, jnp.sqrt(r2 + _EPS), 1.0)
        inv_r = 1.0 / r
        row_mask = mask_i_ref[...]             # (TI, 1)
        col_mask = mask_j_ref[...]             # (1, N)
        one = row_mask * col_mask * not_self
        within = (r < rc).astype(xi.dtype) * one

        sig_ij = 0.5 * (sig_i_ref[...] + sig_j_ref[...])
        eps_ij = eps_i_ref[...] * eps_j_ref[...]  # channels carry sqrt(eps)
        sr6 = (sig_ij * inv_r) ** 6
        sl = sl_ref[...]
        if switch_d is None:
            sr6c = (sig_ij * (1.0 / rc)) ** 6
            e_lj = 4.0 * eps_ij * ((sr6 * sr6 - sr6)
                                   - (sr6c * sr6c - sr6c)) * sl
        else:
            # OpenMM switching (md/forces.py lj_switch): unshifted LJ
            # times the smoothstep; force carries the product rule below
            e_lj_raw = 4.0 * eps_ij * (sr6 * sr6 - sr6) * sl
            sw, dsw = lj_switch(r, switch_d, rc)
            e_lj = e_lj_raw * sw
        qq = q_i_ref[...] * q_j_ref[...]
        se = se_ref[...]
        full = (se >= 1.0).astype(xi.dtype)
        e_rf = ke * qq * (inv_r + k_rf * r * r - c_rf) * full
        e_14 = ke * qq * inv_r * se * (1.0 - full)
        e_row = 0.5 * jnp.sum((e_lj + e_rf) * within + e_14 * one,
                              axis=1, keepdims=True)
        e_ref[...] = e_row

        # dE/dr (unordered pair), both directions summed per row
        w_lj = 4.0 * eps_ij * (-12.0 * sr6 * sr6 + 6.0 * sr6) * inv_r * sl
        if switch_d is not None:
            w_lj = w_lj * sw + e_lj_raw * dsw
        w_rf = ke * qq * (-inv_r * inv_r + 2.0 * k_rf * r) * full
        w_14 = -ke * qq * inv_r * inv_r * se * (1.0 - full)
        W = (w_lj + w_rf) * within + w_14 * one
        W = W * inv_r
        f0 = -jnp.sum(W * dd0, axis=1, keepdims=True)
        f1 = -jnp.sum(W * dd1, axis=1, keepdims=True)
        f2 = -jnp.sum(W * dd2, axis=1, keepdims=True)
        F_ref[...] = jnp.concatenate([f0, f1, f2], axis=1)

    vmem = pltpu.VMEM
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def row_spec(width):
        return pl.BlockSpec((tile, width), (lambda i: (i, 0)),
                            memory_space=vmem)

    def bcast_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda *_: (0,) * nd),
                            memory_space=vmem)

    col = {
        "q": q[None, :], "sig": sig[None, :], "eps": eps[None, :],
        "mask": mask[None, :],
    }
    row = {k: v[0][:, None] for k, v in col.items()}

    def sweep(xp, xf):
        ins = [
            xp, xf,
            jnp.asarray(row["q"]), jnp.asarray(col["q"]),
            jnp.asarray(row["sig"]), jnp.asarray(col["sig"]),
            jnp.asarray(row["eps"]), jnp.asarray(col["eps"]),
            jnp.asarray(se_full), jnp.asarray(sl_full),
            jnp.asarray(row["mask"]), jnp.asarray(col["mask"]),
        ]
        specs = [
            row_spec(3), bcast_spec((3, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(N), row_spec(N),
            row_spec(1), bcast_spec((1, N)),
        ]
        return pl.pallas_call(
            kernel, grid=(GRID,), compiler_params=params,
            out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.float32),
                       jax.ShapeDtypeStruct((N, 3), jnp.float32)),
            in_specs=specs, out_specs=(row_spec(1), row_spec(3)),
            interpret=interpret,
        )(*ins)

    from .forces import angle_energy, bond_energy, torsion_energy

    def bonded_energy(x):
        return (bond_energy(system, x) + angle_energy(system, x)
                + torsion_energy(system, x))

    @jax.jit
    def force_fn(x):
        xp = jnp.zeros((N, 3), jnp.float32).at[:n_real].set(
            x.astype(jnp.float32))
        e_rows, F = sweep(xp, xp.T)
        e_b, g_b = jax.value_and_grad(bonded_energy)(x)
        return jnp.sum(e_rows) + e_b, F[:n_real] - g_b

    # virtual-site systems (TIP4P-Ew): expand/spread wrap (md/vsites.py);
    # no-op for systems without sites
    from .vsites import wrap_force_fn as _wrap_vsites

    return _wrap_vsites(force_fn, system)


__all__ = ["build_periodic_force_fn"]
