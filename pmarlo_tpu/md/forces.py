"""Potential energy as one pure, jittable JAX function.

TPU-native replacement for OpenMM's force kernels (reference:
src/pmarlo/simulation/__init__.py:64-71 — amber14 + GBN2 implicit solvent,
NoCutoff). Everything is dense and statically shaped:

- bonded terms: segment gathers + vectorized trig, O(N_terms)
- nonbonded: full (N, N) pairwise matrices (the reference runs NoCutoff for
  implicit-solvent systems, so dense is both exact and the fastest mapping
  onto the TPU's vector units for N up to a few thousand)
- GB: OBC2 or GBn2 Born radii (HCT pair integral + GBn2 neck correction +
  tanh rescale with global or per-element coefficients) and the ACE
  surface-area term. GBn2 matches the reference's implicit/gbn2.xml
  (see md/gbn2.py for the neck-table construction).

Forces are ``jax.grad`` of this function; bias potentials (DeepTICA CVs,
metadynamics) fuse by adding their energy to the same scalar before grad.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
from .ff_params import GB_DIELECTRIC_OFFSET, OBC2_ALPHA, OBC2_BETA, OBC2_GAMMA
from .system import System

_EPS = 1e-12


def lj_switch(r, r_switch: float, r_cutoff: float):
    """OpenMM LJ switching function: quintic smoothstep S and dS/dr.

    S(x) = 1 - 10 x^3 + 15 x^4 - 6 x^5 with x = (r - r_sw)/(rc - r_sw),
    clipped to [0, 1]: S = 1 below the switch distance, S = 0 at the
    cutoff, with zero first AND second derivatives at both ends — so
    multiplying the unshifted LJ energy by S makes energy and force
    continuous at the cutoff (NonbondedForce ``setUseSwitchingFunction``
    semantics; the reference's Systems are built by OpenMM createSystem
    at /root/reference/src/pmarlo/protein/protein.py:733, where this is
    an optional knob). Pure arithmetic: safe inside Pallas kernels.
    Returns ``(S, dS/dr)``."""
    inv_w = 1.0 / (r_cutoff - r_switch)
    x = jnp.clip((r - r_switch) * inv_w, 0.0, 1.0)
    s = 1.0 + x * x * x * (-10.0 + x * (15.0 - x * 6.0))
    ds = x * x * (-30.0 + x * (60.0 - x * 30.0)) * inv_w
    return s, ds


def bond_energy(system: System, positions: jax.Array) -> jax.Array:
    ri = positions[system.bond_idx[:, 0]]
    rj = positions[system.bond_idx[:, 1]]
    r = jnp.sqrt(jnp.sum((ri - rj) ** 2, axis=-1) + _EPS)
    return jnp.sum(0.5 * system.bond_k * (r - system.bond_r0) ** 2)


def angle_energy(system: System, positions: jax.Array) -> jax.Array:
    a = positions[system.angle_idx[:, 0]]
    b = positions[system.angle_idx[:, 1]]
    c = positions[system.angle_idx[:, 2]]
    v1 = a - b
    v2 = c - b
    cos_t = jnp.sum(v1 * v2, axis=-1) / jnp.sqrt(
        jnp.sum(v1 * v1, axis=-1) * jnp.sum(v2 * v2, axis=-1) + _EPS
    )
    theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
    return jnp.sum(0.5 * system.angle_k * (theta - system.angle_t0) ** 2)


def dihedral_angles(positions: jax.Array, idx: jax.Array) -> jax.Array:
    """Signed dihedral angles (rad) for (M, 4) index quadruples.

    atan2 formulation — smooth everywhere, grad-safe (no arccos branch).
    """
    p0 = positions[idx[:, 0]]
    p1 = positions[idx[:, 1]]
    p2 = positions[idx[:, 2]]
    p3 = positions[idx[:, 3]]
    b0 = p1 - p0
    b1 = p2 - p1
    b2 = p3 - p2
    n1 = jnp.cross(b0, b1)
    n2 = jnp.cross(b1, b2)
    b1n = b1 / jnp.sqrt(jnp.sum(b1 * b1, axis=-1, keepdims=True) + _EPS)
    x = jnp.sum(n1 * n2, axis=-1)
    # IUPAC/mdtraj sign (see features/builtins.py); amber phases are all
    # 0 or pi so torsion ENERGY is even in phi — this choice matters for
    # reported angles and CV features, not for the dynamics
    y = jnp.sum(jnp.cross(n1, n2) * b1n, axis=-1)
    return jnp.arctan2(y, x)


def torsion_energy(system: System, positions: jax.Array) -> jax.Array:
    phi = dihedral_angles(positions, system.torsion_idx)
    return jnp.sum(
        system.torsion_k
        * (1.0 + jnp.cos(system.torsion_n * phi - system.torsion_phase))
    )


def _pairwise_distances(positions: jax.Array) -> jax.Array:
    diff = positions[:, None, :] - positions[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS)


def nonbonded_energy(system: System, positions: jax.Array) -> jax.Array:
    """LJ 12-6 + Coulomb with per-pair scale matrices (dense, upper-tri)."""
    from .system import require_dense_scales

    require_dense_scales(system, "nonbonded_energy (dense XLA path)")
    r = _pairwise_distances(positions)
    n = r.shape[0]
    eye = jnp.eye(n, dtype=positions.dtype)
    # diagonal r ~ sqrt(eps): (sigma/r)^12 would overflow f32 and poison the
    # masked sum with inf*0=nan — push the diagonal to a safe 1 nm instead.
    r_safe = r + eye
    inv_r = 1.0 / r_safe
    # Lorentz-Berthelot combining
    sigma_ij = 0.5 * (system.lj_sigma[:, None] + system.lj_sigma[None, :])
    eps_ij = jnp.sqrt(jnp.maximum(
        system.lj_eps[:, None] * system.lj_eps[None, :], 0.0))
    # exact at eps = 0 (no additive floor): zero-eps hydrogens must
    # contribute EXACTLY no LJ, matching the kernels' sqrt(eps)-channel
    # formulation (gradients are w.r.t. positions, so sqrt(0) is safe)
    sr6 = (sigma_ij * inv_r) ** 6
    e_lj = 4.0 * eps_ij * (sr6 * sr6 - sr6) * system.scale_lj
    qq = system.charges[:, None] * system.charges[None, :]
    e_el = (
        COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 / system.solute_dielectric
    ) * qq * inv_r * system.scale_elec
    upper = jnp.triu(jnp.ones((n, n), dtype=positions.dtype), k=1)
    return jnp.sum((e_lj + e_el) * upper)


def periodic_nonbonded_energy(
    system: System, positions: jax.Array
) -> jax.Array:
    """Min-image LJ + reaction-field Coulomb for periodic systems
    (OpenMM CutoffPeriodic semantics: RF beyond-cutoff dielectric
    ``solvent_dielectric``; LJ potential-shifted to 0 at the cutoff).

    Dense O(N^2) with the minimum-image convention — on TPU this beats
    gather-based neighbor lists up to ~10k atoms (md/nblist.py caveat).
    Requires every box length > 2 * cutoff. Exclusion scales apply to
    both terms; 1-4 Coulomb keeps the plain 1/r form (no RF shift),
    matching OpenMM's exception handling.
    """
    from .system import require_dense_scales

    require_dense_scales(system, "periodic_nonbonded_energy (dense XLA path)")
    if system.box is None:
        raise ValueError("periodic_nonbonded_energy needs system.box")
    box = jnp.asarray(system.box, dtype=positions.dtype)
    rc = system.cutoff
    diff = positions[:, None, :] - positions[None, :, :]
    tilt = getattr(system, "tilt", None)
    if tilt is None:
        diff = diff - box * jnp.round(diff / box)
    else:
        # rounded fractional minimum image: exact for every r < cutoff
        # because build_system enforces min perp width > 2*cutoff, and
        # beyond-cutoff pairs are masked regardless of which image the
        # rounding picks. (min_image_exact would be 27x the memory —
        # an (N, N, 27, 3) candidate array OOMs mid-size systems.)
        from .box import box_matrix, min_image_round

        H = box_matrix(system.box, tilt)
        diff = min_image_round(
            diff, jnp.asarray(H, positions.dtype),
            jnp.asarray(np.linalg.inv(H), positions.dtype),
        )
    r2 = jnp.sum(diff * diff, axis=-1)
    n = r2.shape[0]
    eye = jnp.eye(n, dtype=positions.dtype)
    r = jnp.sqrt(r2 + _EPS) + eye
    inv_r = 1.0 / r
    within = (r < rc).astype(positions.dtype) * (1.0 - eye)

    sigma_ij = 0.5 * (system.lj_sigma[:, None] + system.lj_sigma[None, :])
    eps_ij = jnp.sqrt(jnp.maximum(
        system.lj_eps[:, None] * system.lj_eps[None, :], 0.0))
    # exact at eps = 0 (no additive floor): zero-eps hydrogens must
    # contribute EXACTLY no LJ, matching the kernels' sqrt(eps)-channel
    # formulation (gradients are w.r.t. positions, so sqrt(0) is safe)
    sr6 = (sigma_ij * inv_r) ** 6
    if system.switch_distance is None:
        sr6c = (sigma_ij / rc) ** 6
        e_lj = 4.0 * eps_ij * ((sr6 * sr6 - sr6) - (sr6c * sr6c - sr6c))
    else:
        # switching replaces the potential shift: unshifted LJ times the
        # smoothstep (already 0 at rc, so no shift is needed)
        sw, _ = lj_switch(r, float(system.switch_distance), rc)
        e_lj = 4.0 * eps_ij * (sr6 * sr6 - sr6) * sw
    e_lj = e_lj * system.scale_lj * within

    # reaction field: E = ke q q (1/r + k_rf r^2 - c_rf), r < rc
    eps_rf = system.solvent_dielectric
    k_rf = (eps_rf - 1.0) / ((2.0 * eps_rf + 1.0) * rc**3)
    c_rf = 1.0 / rc + k_rf * rc * rc
    ke = COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 / system.solute_dielectric
    qq = system.charges[:, None] * system.charges[None, :]
    full = (system.scale_elec >= 1.0).astype(positions.dtype)
    e_rf = ke * qq * (inv_r + k_rf * r * r - c_rf) * full * within
    # 1-4 exceptions: scaled plain Coulomb, no RF shift (OpenMM rule)
    part = system.scale_elec * (1.0 - full)
    e_14 = ke * qq * inv_r * part * (1.0 - eye)
    e_el = e_rf + e_14

    upper = jnp.triu(jnp.ones((n, n), dtype=positions.dtype), k=1)
    return jnp.sum((e_lj + e_el) * upper)


def born_radii(system: System, positions: jax.Array) -> jax.Array:
    """OBC/GBn2 Born radii: HCT pairwise descreening integral (+ GBn2 neck
    correction) followed by the tanh rescale with global (OBC2) or
    per-atom (GBn2) coefficients."""
    r = _pairwise_distances(positions)
    n = r.shape[0]
    offset = system.gb_offset
    rho = system.gb_radii - offset                       # (N,)
    sr = system.gb_screen * rho                          # (N,) scaled of j
    rho_i = rho[:, None]
    sr_j = sr[None, :]

    U_raw = r + sr_j
    # GBn2 sulfur screening is NEGATIVE, so U can be <= 0 at close range;
    # such pairs are masked out below, but 0 * log(U<=0) is still NaN —
    # sanitize U wherever the pair is inactive
    inactive = U_raw <= rho_i
    U = jnp.where(inactive, rho_i + 1.0, U_raw)
    L = jnp.maximum(jnp.abs(r - sr_j), rho_i)
    inv_L = 1.0 / L
    inv_U = 1.0 / U
    term = (
        inv_L
        - inv_U
        + 0.25 * (r - sr_j * sr_j / r) * (inv_U * inv_U - inv_L * inv_L)
        + 0.5 * jnp.log(L * inv_U) / r
    )
    # inside-correction when atom i is engulfed: rho_i < sr_j - r
    corr = 2.0 * (1.0 / rho_i - inv_L)
    term = term + jnp.where(sr_j - r > rho_i, corr, 0.0)
    # only pairs where the descreening sphere reaches atom i
    active = (~inactive).astype(positions.dtype)
    mask = (1.0 - jnp.eye(n, dtype=positions.dtype)) * active
    I = 0.5 * jnp.sum(term * mask, axis=1)

    if system.gb_neck_scale != 0.0 and system.gb_neck_m0 is not None:
        from .gbn2 import neck_value_and_derivative

        nv, _ = neck_value_and_derivative(
            r, system.gb_neck_d0, system.gb_neck_m0
        )
        diag = 1.0 - jnp.eye(n, dtype=positions.dtype)
        I = I + system.gb_neck_scale * jnp.sum(nv * diag, axis=1)

    psi = I * rho
    psi2 = psi * psi
    if system.gb_alpha is not None:
        tanh_arg = (
            system.gb_alpha * psi
            - system.gb_beta * psi2
            + system.gb_gamma * psi2 * psi
        )
    else:
        tanh_arg = OBC2_ALPHA * psi - OBC2_BETA * psi2 + OBC2_GAMMA * psi2 * psi
    inv_B = 1.0 / rho - jnp.tanh(tanh_arg) / system.gb_radii
    return 1.0 / jnp.maximum(inv_B, 1e-3)


def gb_energy(system: System, positions: jax.Array) -> jax.Array:
    """Generalized-Born polarization energy + ACE surface-area term."""
    B = born_radii(system, positions)
    r = _pairwise_distances(positions)
    n = r.shape[0]
    BB = B[:, None] * B[None, :]
    f = jnp.sqrt(r * r + BB * jnp.exp(-(r * r) / (4.0 * BB)))
    qq = system.charges[:, None] * system.charges[None, :]
    pref = (
        -0.5
        * COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
        * (1.0 / system.solute_dielectric - 1.0 / system.solvent_dielectric)
    )
    off_diag = (1.0 - jnp.eye(n, dtype=positions.dtype))
    e_cross = pref * jnp.sum(qq * off_diag / f)
    e_self = pref * jnp.sum(system.charges**2 / B)
    # ACE nonpolar term (OpenMM GBSAOBCForce form)
    probe = 0.14
    e_sa = system.surface_tension * jnp.sum(
        (system.gb_radii + probe) ** 2 * (system.gb_radii / B) ** 6
    )
    return e_cross + e_self + e_sa


def potential_energy(
    system: System,
    positions: jax.Array,
    bias_fn=None,
) -> jax.Array:
    """Total potential energy (kJ/mol). ``bias_fn(positions) -> energy`` is
    composed in-graph — this is where CV bias forces fuse into the MD step
    (replacing the reference's TorchForce bridge,
    features/deeptica/openmm_integration.py:189)."""
    nb = (
        periodic_nonbonded_energy if system.box is not None
        else nonbonded_energy
    )
    e = (
        bond_energy(system, positions)
        + angle_energy(system, positions)
        + torsion_energy(system, positions)
        + nb(system, positions)
    )
    if system.use_gb:
        e = e + gb_energy(system, positions)
    if bias_fn is not None:
        e = e + bias_fn(positions)
    return e


def energy_components(system: System, positions: jax.Array) -> Dict[str, jax.Array]:
    nb = (
        periodic_nonbonded_energy if system.box is not None
        else nonbonded_energy
    )
    comps = {
        "bond": bond_energy(system, positions),
        "angle": angle_energy(system, positions),
        "torsion": torsion_energy(system, positions),
        "nonbonded": nb(system, positions),
    }
    if system.use_gb:
        comps["gb"] = gb_energy(system, positions)
    return comps


def compute_forces(
    system: System, positions: jax.Array, bias_fn=None
) -> jax.Array:
    """Forces (kJ/mol/nm) = -dE/dx."""
    return -jax.grad(lambda x: potential_energy(system, x, bias_fn))(positions)


__all__ = [
    "potential_energy",
    "energy_components",
    "compute_forces",
    "bond_energy",
    "angle_energy",
    "torsion_energy",
    "nonbonded_energy",
    "periodic_nonbonded_energy",
    "lj_switch",
    "gb_energy",
    "born_radii",
    "dihedral_angles",
]
