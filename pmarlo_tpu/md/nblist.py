"""Neighbor-listed nonbonded/GB path for large systems.

The dense O(N^2) pair stage (md/forces.py) is exact and fastest for small
implicit-solvent systems, but at protein scale it is HBM-bound: 3gd8
(3,350 atoms) runs ~7 ns/day on one v5e chip. This module evaluates
LJ + Coulomb + GBn2/OBC over a fixed-capacity neighbor list instead —
O(N*M) with M ~ hundreds — cutting pair work and memory traffic by the
sparsity factor. This replaces the capability OpenMM's cutoff schemes gave
the reference for larger systems (reference runs NoCutoff only because
its systems were small; Amber GB practice uses rgbmax-style cutoffs).

Design (all jittable, static shapes):
- ``build_neighbor_list``: top_k over a masked distance matrix — the
  distance matrix is computed but never stored beyond the builder, and
  the list is rebuilt every ``rebuild_interval`` steps with a Verlet
  skin, so the per-step force path only touches (N, M) tensors.
- exclusions are applied IN-PLACE: each atom carries a small padded
  table of its excluded/1-4 partners (typically < 24 entries), and every
  listed pair looks its scale up with an (N, M, K) comparison — no dense
  (N, N) scale matrices on the hot path, and no subtraction of huge
  bonded LJ clashes (a subtraction scheme loses ~1 kJ/mol to f32
  cancellation because the full-strength bonded LJ sum is ~1e6).
- GB Born radii accumulate the HCT integral + GBn2 neck over the same
  list; the GB cross-term is truncated at the cutoff (choose >= 2 nm for
  GB accuracy, the Amber rgbmax convention).
- forces come from ``jax.grad`` of the neighbor energy (gather grads
  lower to scatter-adds).

Parity gate: with a cutoff larger than the system extent the neighbor
energy/forces match the dense path to f32 roundoff
(tests/unit/test_nblist.py).

MEASURED CAVEAT (v5e, 3gd8): the (N, M) gather/scatter pattern is ~40x
SLOWER than the dense path on TPU (301 ms/step vs 23.6 ms at N=3350,
rc=1.2) — TPU gathers serialize. Use this path on CPU, for very large N
where the dense (N, N) stages no longer fit memory, or as the reference
implementation; the TPU fast path for protein-scale N is the tiled
Pallas pair kernel (md/pallas_pair.py), which keeps coordinates in VMEM
and recomputes pair quantities instead of gathering.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
from .ff_params import SCEE, SCNB
from .system import System

_EPS = 1e-12


class NeighborList(NamedTuple):
    idx: jax.Array    # (N, M) int32 neighbor indices (self-padded)
    mask: jax.Array   # (N, M) float32 1/0 validity
    n_max: jax.Array  # () int32: max neighbors actually found (overflow check)


def build_neighbor_list(
    positions: jax.Array, cutoff: float, capacity: int
) -> NeighborList:
    """Fixed-capacity per-atom neighbor list within ``cutoff`` (nm).

    Lists BOTH directions of every pair (i in j's list and j in i's), as
    the Born-radius integral needs row-complete sums. Overflow saturates
    at ``capacity`` nearest neighbors; check ``n_max`` host-side.
    """
    n = positions.shape[0]
    diff = positions[:, None, :] - positions[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    within = (d2 < cutoff * cutoff) & ~eye
    score = jnp.where(within, -d2, -jnp.inf)
    k = min(capacity, n)
    _, idx = jax.lax.top_k(score, k)
    mask = jnp.take_along_axis(within, idx, axis=1)
    # self-pad invalid slots so gathers stay in-bounds and r != 0
    rows = jnp.arange(n, dtype=idx.dtype)[:, None]
    idx = jnp.where(mask, idx, rows)
    return NeighborList(
        idx=idx.astype(jnp.int32),
        mask=mask.astype(positions.dtype),
        n_max=within.sum(axis=1).max().astype(jnp.int32),
    )


def _pair_r(positions: jax.Array, nl: NeighborList) -> jax.Array:
    """Pair distances with masked (self-padded) slots pushed to 1 nm —
    r ~ 0 there would overflow (sigma/r)^12 to inf and poison the masked
    sums with inf * 0 = NaN."""
    xj = positions[nl.idx]                       # (N, M, 3)
    d = positions[:, None, :] - xj
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    return r + (1.0 - nl.mask)


def _lj_coulomb_pair(system: System, r, i_idx, j_idx):
    """Full-strength LJ + Coulomb for index arrays of any shape."""
    sig = 0.5 * (system.lj_sigma[i_idx] + system.lj_sigma[j_idx])
    eps = jnp.sqrt(jnp.maximum(
        system.lj_eps[i_idx] * system.lj_eps[j_idx], 0.0))
    inv_r = 1.0 / r
    sr6 = (sig * inv_r) ** 6
    e_lj = 4.0 * eps * (sr6 * sr6 - sr6)
    ke = COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 / system.solute_dielectric
    e_el = ke * system.charges[i_idx] * system.charges[j_idx] * inv_r
    return e_lj, e_el


class ExclusionTables(NamedTuple):
    """Per-atom padded exclusion partner tables (host-precomputed)."""

    partner: jax.Array   # (N, K) int32, padded with -1
    scale_el: jax.Array  # (N, K) electrostatic scale at that partner
    scale_lj: jax.Array  # (N, K) LJ scale at that partner


def make_exclusion_tables(system: System) -> ExclusionTables:
    """Build the per-atom tables from the System's exclusion pair lists
    (host-side numpy; call once before jitting the force path)."""
    import numpy as np

    if system.excl12_idx is None:
        raise ValueError(
            "system lacks exclusion index lists; rebuild it with the "
            "current md.forcefield.build_system"
        )
    n = system.n_atoms
    per_atom: list = [[] for _ in range(n)]
    for i, j in np.asarray(system.excl12_idx):
        per_atom[int(i)].append((int(j), 0.0, 0.0))
        per_atom[int(j)].append((int(i), 0.0, 0.0))
    for i, j in np.asarray(system.pair14_idx):
        per_atom[int(i)].append((int(j), SCEE, SCNB))
        per_atom[int(j)].append((int(i), SCEE, SCNB))
    k = max((len(p) for p in per_atom), default=1)
    partner = np.full((n, k), -1, dtype=np.int32)
    s_el = np.ones((n, k), dtype=np.float32)
    s_lj = np.ones((n, k), dtype=np.float32)
    for i, entries in enumerate(per_atom):
        for slot, (j, se, sl) in enumerate(entries):
            partner[i, slot] = j
            s_el[i, slot] = se
            s_lj[i, slot] = sl
    return ExclusionTables(
        partner=jnp.asarray(partner),
        scale_el=jnp.asarray(s_el),
        scale_lj=jnp.asarray(s_lj),
    )


def nonbonded_energy_nb(
    system: System,
    positions: jax.Array,
    nl: NeighborList,
    tables: ExclusionTables,
):
    """LJ + Coulomb over the neighbor list with in-place exclusion scaling."""
    r = _pair_r(positions, nl)
    i_idx = jnp.arange(positions.shape[0])[:, None]
    e_lj, e_el = _lj_coulomb_pair(system, r, i_idx, nl.idx)
    # per-pair scale from the row's exclusion table ((N, M, K) compare;
    # unmatched pairs keep scale 1)
    match = (nl.idx[:, :, None] == tables.partner[:, None, :]).astype(r.dtype)
    s_el = 1.0 - jnp.sum(match * (1.0 - tables.scale_el[:, None, :]), axis=-1)
    s_lj = 1.0 - jnp.sum(match * (1.0 - tables.scale_lj[:, None, :]), axis=-1)
    return 0.5 * jnp.sum((e_lj * s_lj + e_el * s_el) * nl.mask)


def born_radii_nb(system: System, positions: jax.Array, nl: NeighborList):
    """HCT descreening integral (+ GBn2 neck) over the neighbor list."""
    r = _pair_r(positions, nl)
    rho = system.gb_radii - system.gb_offset
    sr = system.gb_screen * rho
    rho_i = rho[:, None]
    sr_j = sr[nl.idx]

    U_raw = r + sr_j
    inactive = U_raw <= rho_i
    U = jnp.where(inactive, rho_i + 1.0, U_raw)
    L = jnp.maximum(jnp.abs(r - sr_j), rho_i)
    inv_L, inv_U = 1.0 / L, 1.0 / U
    term = (
        inv_L - inv_U
        + 0.25 * (r - sr_j * sr_j / r) * (inv_U * inv_U - inv_L * inv_L)
        + 0.5 * jnp.log(L * inv_U) / r
    )
    term = term + jnp.where(sr_j - r > rho_i, 2.0 * (1.0 / rho_i - inv_L), 0.0)
    active = (~inactive).astype(positions.dtype) * nl.mask
    I = 0.5 * jnp.sum(term * active, axis=1)

    if system.gb_neck_scale != 0.0 and system.gb_neck_m0 is not None:
        from .gbn2 import neck_value_and_derivative

        i_idx = jnp.arange(positions.shape[0])[:, None]
        d0 = system.gb_neck_d0[i_idx, nl.idx]
        m0 = system.gb_neck_m0[i_idx, nl.idx]
        nv, _ = neck_value_and_derivative(r, d0, m0)
        I = I + system.gb_neck_scale * jnp.sum(nv * nl.mask, axis=1)

    psi = I * rho
    psi2 = psi * psi
    if system.gb_alpha is not None:
        tanh_arg = (system.gb_alpha * psi - system.gb_beta * psi2
                    + system.gb_gamma * psi2 * psi)
    else:
        from .ff_params import OBC2_ALPHA, OBC2_BETA, OBC2_GAMMA

        tanh_arg = OBC2_ALPHA * psi - OBC2_BETA * psi2 + OBC2_GAMMA * psi2 * psi
    inv_B = 1.0 / rho - jnp.tanh(tanh_arg) / system.gb_radii
    return 1.0 / jnp.maximum(inv_B, 1e-3)


def gb_energy_nb(system: System, positions: jax.Array, nl: NeighborList):
    """GB polarization + ACE SA with the cross-term truncated at the
    cutoff (choose the cutoff >= 2 nm for GB accuracy, Amber rgbmax)."""
    B = born_radii_nb(system, positions, nl)
    r = _pair_r(positions, nl)
    Bi = B[:, None]
    Bj = B[nl.idx]
    BB = Bi * Bj
    f = jnp.sqrt(r * r + BB * jnp.exp(-(r * r) / (4.0 * BB)))
    pref = (
        -0.5 * COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
        * (1.0 / system.solute_dielectric - 1.0 / system.solvent_dielectric)
    )
    qq = system.charges[:, None] * system.charges[nl.idx]
    e_cross = pref * jnp.sum(qq / f * nl.mask)           # both directions
    e_self = pref * jnp.sum(system.charges**2 / B)
    probe = 0.14
    e_sa = system.surface_tension * jnp.sum(
        (system.gb_radii + probe) ** 2 * (system.gb_radii / B) ** 6
    )
    return e_cross + e_self + e_sa


def potential_energy_nb(
    system: System,
    positions: jax.Array,
    nl: NeighborList,
    tables: Optional[ExclusionTables] = None,
    bias_fn: Optional[Callable] = None,
) -> jax.Array:
    """Total potential with the nonbonded/GB stages on the neighbor list
    (bonded terms are index-based already — shared with the dense path).
    Precompute ``tables`` (make_exclusion_tables) before jitting."""
    from .forces import angle_energy, bond_energy, torsion_energy

    if tables is None:
        tables = make_exclusion_tables(system)
    e = (
        bond_energy(system, positions)
        + angle_energy(system, positions)
        + torsion_energy(system, positions)
        + nonbonded_energy_nb(system, positions, nl, tables)
    )
    if system.use_gb:
        e = e + gb_energy_nb(system, positions, nl)
    if bias_fn is not None:
        e = e + bias_fn(positions)
    return e


def run_md_nb(
    system: System,
    state,
    *,
    n_steps: int,
    dt: float,
    friction: float,
    temperature_K,
    report_interval: int = 100,
    cutoff: float = 2.0,
    skin: float = 0.2,
    capacity: Optional[int] = None,
    rebuild_interval: int = 20,
    bias_fn: Optional[Callable] = None,
):
    """Neighbor-listed analogue of md.integrate.run_md.

    The outer scan rebuilds the list (cutoff + skin) every
    ``rebuild_interval`` steps; the inner scan advances Langevin steps
    against the frozen list. Returns (final_state, frames) like run_md.
    """
    from .integrate import instantaneous_temperature, langevin_step

    if report_interval % rebuild_interval != 0:
        raise ValueError("rebuild_interval must divide report_interval")
    if n_steps % report_interval != 0:
        raise ValueError("report_interval must divide n_steps")
    n = system.n_atoms
    if capacity is None:
        # conservative density estimate: ~100 atoms/nm^3 protein interior
        capacity = min(n - 1, max(64, int(120 * (cutoff + skin) ** 3)))
    tables = make_exclusion_tables(system)

    def force_fn(x, nl):
        e, g = jax.value_and_grad(
            lambda p: potential_energy_nb(system, p, nl, tables, bias_fn)
        )(x)
        return e, -g

    def step(carry, _):
        st, nl = carry
        e, f = force_fn(st.positions, nl)

        def step_force(x):
            return force_fn(x, nl)

        new_state, energy = langevin_step(
            system, st, dt=dt, friction=friction,
            temperature_K=temperature_K,
            force_fn=lambda x: force_fn(x, nl),
        )
        return (new_state, nl), energy

    def rebuild_window(carry, _):
        st = carry
        nl = build_neighbor_list(st.positions, cutoff + skin, capacity)
        (st, _), energies = jax.lax.scan(
            step, (st, nl), None, length=rebuild_interval
        )
        return st, energies[-1]

    n_windows_per_report = report_interval // rebuild_interval

    def report_window(carry, _):
        st = carry
        st, energies = jax.lax.scan(
            rebuild_window, st, None, length=n_windows_per_report
        )
        frame = {
            "positions": st.positions,
            "potential_energy": energies[-1],
            "temperature": instantaneous_temperature(system, st.velocities),
        }
        return st, frame

    final_state, frames = jax.lax.scan(
        report_window, state, None, length=n_steps // report_interval
    )
    return final_state, frames


__all__ = [
    "NeighborList", "ExclusionTables", "build_neighbor_list",
    "make_exclusion_tables", "nonbonded_energy_nb", "born_radii_nb",
    "gb_energy_nb", "potential_energy_nb", "run_md_nb",
]
