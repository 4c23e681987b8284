"""Analytic energy + forces as dense tensor ops (no autodiff).

This is the compute core of the fused Pallas MD kernel (md/pallas_md.py)
and a drop-in fast path for plain XLA. Two design moves make it TPU-native:

1. **Bonded terms via one-hot matmuls.** Gathering atoms for bonds/angles/
   torsions and scattering forces back are expressed as matmuls with
   precomputed one-hot selection matrices (S @ x gathers, S.T @ f
   scatters) — MXU-friendly, no gather/scatter kernels, and legal inside
   Pallas where advanced indexing is limited.
2. **Manual derivatives everywhere** (bond/angle/torsion standard
   formulas; LJ/Coulomb pair coefficients; the full GB-OBC chain rule
   through Born radii). jax.grad cannot differentiate through a Pallas
   kernel without a custom VJP; computing forces analytically removes the
   need entirely and halves the op count vs forward+reverse passes.

Matches md/forces.py (autodiff reference) to float32 accuracy — asserted in
tests/unit/test_analytic_forces.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
from .ff_params import GB_DIELECTRIC_OFFSET, OBC2_ALPHA, OBC2_BETA, OBC2_GAMMA
from .system import System

_EPS = 1e-12


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseParams:
    """System parameters pre-baked into dense kernel-ready arrays."""

    # nonbonded pair matrices (N, N); diagonals zeroed
    qq_scaled: jax.Array      # ke * qi qj * scale_elec / eps_solute
    lj_a: jax.Array           # 4 eps sigma^12 * scale_lj
    lj_b: jax.Array           # 4 eps sigma^6  * scale_lj
    # GB per-atom
    q: jax.Array              # (N,)
    qq_full: jax.Array        # (N, N) ke' qi qj (NO exclusions; GB sees all)
    gb_rho: jax.Array         # (N,) intrinsic radius - offset
    gb_sr: jax.Array          # (N,) screen * rho
    gb_radii: jax.Array       # (N,)
    gb_pref: jax.Array        # scalar: -0.5 ke (1/eps_in - 1/eps_out)
    sa_coef: jax.Array        # (N,) surface_tension * (R+probe)^2 * R^6
    gb_alpha: jax.Array       # (N,) tanh-rescale coefficients (OBC2 consts
    gb_beta: jax.Array        # broadcast, or GBn2 per-element values)
    gb_gamma: jax.Array
    # bonded: one-hot selectors and parameters
    bond_s1: jax.Array        # (NB, N)
    bond_s2: jax.Array
    bond_k: jax.Array
    bond_r0: jax.Array
    angle_s1: jax.Array       # (NA, N)
    angle_s2: jax.Array
    angle_s3: jax.Array
    angle_k: jax.Array
    angle_t0: jax.Array
    tor_s1: jax.Array         # (NT, N)
    tor_s2: jax.Array
    tor_s3: jax.Array
    tor_s4: jax.Array
    tor_k: jax.Array
    tor_n: jax.Array
    tor_phase: jax.Array
    masses: jax.Array         # (N,)
    #: GBn2 neck-correction lookup (None when neck_scale == 0)
    neck_d0: "jax.Array | None" = None   # (N, N)
    neck_m0: "jax.Array | None" = None   # (N, N)
    use_gb: bool = dataclasses.field(metadata=dict(static=True), default=True)
    neck_scale: float = dataclasses.field(metadata=dict(static=True), default=0.0)


def _one_hot(idx: np.ndarray, n: int, dtype) -> np.ndarray:
    m = np.zeros((len(idx), n), dtype=dtype)
    m[np.arange(len(idx)), idx] = 1.0
    return m


def make_dense_params(system: System, dtype=jnp.float32) -> DenseParams:
    n = system.n_atoms
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    sigma = np.asarray(system.lj_sigma, dtype=np.float64)
    eps = np.asarray(system.lj_eps, dtype=np.float64)
    sigma_ij = 0.5 * (sigma[:, None] + sigma[None, :])
    eps_ij = np.sqrt(np.maximum(eps[:, None] * eps[None, :], 0.0))
    scale_l = np.asarray(system.scale_lj, dtype=np.float64)
    from .system import require_dense_scales

    require_dense_scales(system, "the analytic dense force path")
    scale_e = np.asarray(system.scale_elec, dtype=np.float64)
    q = np.asarray(system.charges, dtype=np.float64)
    ke = COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 / system.solute_dielectric
    qq_scaled = ke * np.outer(q, q) * scale_e
    np.fill_diagonal(qq_scaled, 0.0)
    lj_a = 4.0 * eps_ij * sigma_ij**12 * scale_l
    lj_b = 4.0 * eps_ij * sigma_ij**6 * scale_l
    np.fill_diagonal(lj_a, 0.0)
    np.fill_diagonal(lj_b, 0.0)

    gb_pref = (
        -0.5
        * COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
        * (1.0 / system.solute_dielectric - 1.0 / system.solvent_dielectric)
    )
    radii = np.asarray(system.gb_radii, dtype=np.float64)
    rho = radii - system.gb_offset
    sr = np.asarray(system.gb_screen, dtype=np.float64) * rho
    n_at = len(radii)
    if system.gb_alpha is not None:
        gb_alpha = np.asarray(system.gb_alpha, dtype=np.float64)
        gb_beta = np.asarray(system.gb_beta, dtype=np.float64)
        gb_gamma = np.asarray(system.gb_gamma, dtype=np.float64)
    else:
        gb_alpha = np.full(n_at, OBC2_ALPHA)
        gb_beta = np.full(n_at, OBC2_BETA)
        gb_gamma = np.full(n_at, OBC2_GAMMA)
    probe = 0.14
    sa_coef = system.surface_tension * (radii + probe) ** 2 * radii**6

    b_idx = np.asarray(system.bond_idx)
    a_idx = np.asarray(system.angle_idx)
    t_idx = np.asarray(system.torsion_idx)
    return DenseParams(
        qq_scaled=jnp.asarray(qq_scaled, dtype),
        lj_a=jnp.asarray(lj_a, dtype),
        lj_b=jnp.asarray(lj_b, dtype),
        q=jnp.asarray(q, dtype),
        qq_full=jnp.asarray(gb_pref * np.outer(q, q), dtype),
        gb_rho=jnp.asarray(rho, dtype),
        gb_sr=jnp.asarray(sr, dtype),
        gb_radii=jnp.asarray(radii, dtype),
        gb_pref=jnp.asarray(gb_pref, dtype),
        gb_alpha=jnp.asarray(gb_alpha, dtype),
        gb_beta=jnp.asarray(gb_beta, dtype),
        gb_gamma=jnp.asarray(gb_gamma, dtype),
        neck_d0=(None if system.gb_neck_d0 is None
                 else jnp.asarray(system.gb_neck_d0, dtype)),
        neck_m0=(None if system.gb_neck_m0 is None
                 else jnp.asarray(system.gb_neck_m0, dtype)),
        sa_coef=jnp.asarray(sa_coef, dtype),
        bond_s1=jnp.asarray(_one_hot(b_idx[:, 0], n, npdt)),
        bond_s2=jnp.asarray(_one_hot(b_idx[:, 1], n, npdt)),
        bond_k=jnp.asarray(system.bond_k, dtype),
        bond_r0=jnp.asarray(system.bond_r0, dtype),
        angle_s1=jnp.asarray(_one_hot(a_idx[:, 0], n, npdt)),
        angle_s2=jnp.asarray(_one_hot(a_idx[:, 1], n, npdt)),
        angle_s3=jnp.asarray(_one_hot(a_idx[:, 2], n, npdt)),
        angle_k=jnp.asarray(system.angle_k, dtype),
        angle_t0=jnp.asarray(system.angle_t0, dtype),
        tor_s1=jnp.asarray(_one_hot(t_idx[:, 0], n, npdt)),
        tor_s2=jnp.asarray(_one_hot(t_idx[:, 1], n, npdt)),
        tor_s3=jnp.asarray(_one_hot(t_idx[:, 2], n, npdt)),
        tor_s4=jnp.asarray(_one_hot(t_idx[:, 3], n, npdt)),
        tor_k=jnp.asarray(system.torsion_k, dtype),
        tor_n=jnp.asarray(system.torsion_n, dtype),
        tor_phase=jnp.asarray(system.torsion_phase, dtype),
        masses=jnp.asarray(system.masses, dtype),
        use_gb=system.use_gb,
        neck_scale=float(system.gb_neck_scale),
    )


def _mm(a, b):
    # HIGHEST precision: the TPU MXU defaults to bf16 multiplies, which
    # would round coordinates during one-hot gathers (1e-2 relative force
    # error); these matmuls are tiny so exactness is free.
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bond_energy_forces(p: DenseParams, x):
    x1 = _mm(p.bond_s1, x)
    x2 = _mm(p.bond_s2, x)
    d = x1 - x2
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    dr = r - p.bond_r0
    energy = jnp.sum(0.5 * p.bond_k * dr * dr)
    coef = (p.bond_k * dr / r)[:, None]          # dE/dr * (1/r)
    f1 = -coef * d
    forces = _mm(p.bond_s1.T, f1) - _mm(p.bond_s2.T, f1)
    return energy, forces


def _angle_energy_forces(p: DenseParams, x):
    xi = _mm(p.angle_s1, x)
    xj = _mm(p.angle_s2, x)
    xk = _mm(p.angle_s3, x)
    u = xi - xj
    w = xk - xj
    lu = jnp.sqrt(jnp.sum(u * u, axis=-1) + _EPS)
    lw = jnp.sqrt(jnp.sum(w * w, axis=-1) + _EPS)
    nu = u / lu[:, None]
    nw = w / lw[:, None]
    cos_t = jnp.clip(jnp.sum(nu * nw, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    dE = p.angle_k * (theta - p.angle_t0)        # dE/dtheta
    energy = jnp.sum(0.5 * p.angle_k * (theta - p.angle_t0) ** 2)
    # dtheta/dxi = (cos_t*nu - nw) / (lu * sin_t); symmetric for xk
    gi = (cos_t[:, None] * nu - nw) / (lu * sin_t)[:, None]
    gk = (cos_t[:, None] * nw - nu) / (lw * sin_t)[:, None]
    fi = -dE[:, None] * gi
    fk = -dE[:, None] * gk
    fj = -(fi + fk)
    forces = _mm(p.angle_s1.T, fi) + _mm(p.angle_s2.T, fj) + _mm(p.angle_s3.T, fk)
    return energy, forces


def _torsion_energy_forces(p: DenseParams, x):
    x1 = _mm(p.tor_s1, x)
    x2 = _mm(p.tor_s2, x)
    x3 = _mm(p.tor_s3, x)
    x4 = _mm(p.tor_s4, x)
    b1 = x2 - x1
    b2 = x3 - x2
    b3 = x4 - x3
    m = jnp.cross(b1, b2)
    n = jnp.cross(b2, b3)
    lb2 = jnp.sqrt(jnp.sum(b2 * b2, axis=-1) + _EPS)
    m2 = jnp.sum(m * m, axis=-1) + _EPS
    n2 = jnp.sum(n * n, axis=-1) + _EPS
    # signed angle (same atan2 form as forces.dihedral_angles)
    b2n = b2 / lb2[:, None]
    yy = jnp.sum(jnp.cross(m, b2n) * n, axis=-1)
    xx = jnp.sum(m * n, axis=-1)
    phi = jnp.arctan2(yy, xx)
    energy = jnp.sum(p.tor_k * (1.0 + jnp.cos(p.tor_n * phi - p.tor_phase)))
    dE = -p.tor_k * p.tor_n * jnp.sin(p.tor_n * phi - p.tor_phase)  # dE/dphi
    # analytic dihedral gradient for THIS atan2 sign convention, verified
    # against autodiff (grad_b2 phi = s12*d1 - s32*d4; see tests):
    #   d1 = (|b2|/|m|^2) m ; d4 = -(|b2|/|n|^2) n
    #   d2 = -(1+s12) d1 + s32 d4 ; d3 = s12 d1 - (1+s32) d4
    dphi_dx1 = (lb2 / m2)[:, None] * m
    dphi_dx4 = -(lb2 / n2)[:, None] * n
    s12 = (jnp.sum(b1 * b2, axis=-1) / (lb2 * lb2))[:, None]
    s32 = (jnp.sum(b3 * b2, axis=-1) / (lb2 * lb2))[:, None]
    dphi_dx2 = -(1.0 + s12) * dphi_dx1 + s32 * dphi_dx4
    dphi_dx3 = s12 * dphi_dx1 - (1.0 + s32) * dphi_dx4
    f1 = -dE[:, None] * dphi_dx1
    f2 = -dE[:, None] * dphi_dx2
    f3 = -dE[:, None] * dphi_dx3
    f4 = -dE[:, None] * dphi_dx4
    forces = (
        _mm(p.tor_s1.T, f1) + _mm(p.tor_s2.T, f2)
        + _mm(p.tor_s3.T, f3) + _mm(p.tor_s4.T, f4)
    )
    return energy, forces


def _nonbonded_energy_pair_coef(p: DenseParams, r, inv_r):
    """Returns (energy, G) with G_ij = dE/dr_ij over ordered pairs/2."""
    inv_r2 = inv_r * inv_r
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r12 = inv_r6 * inv_r6
    e_mat = p.lj_a * inv_r12 - p.lj_b * inv_r6 + p.qq_scaled * inv_r
    energy = 0.5 * jnp.sum(e_mat)
    # dE/dr over ordered entries (each unordered pair appears twice; the
    # 0.5 prefactor is folded into the force assembly below)
    dmat = (
        -12.0 * p.lj_a * inv_r12 * inv_r
        + 6.0 * p.lj_b * inv_r6 * inv_r
        - p.qq_scaled * inv_r2
    )
    return energy, 0.5 * dmat


def _gb_energy_pair_coef(p: DenseParams, r, inv_r, eye):
    """GB-OBC energy + ordered pair-coefficient matrix (incl. Born chain).

    Returns (energy, G) with G defined as in _nonbonded_energy_pair_coef.
    """
    one = 1.0 - eye
    rho_i = p.gb_rho[:, None]
    sr_j = p.gb_sr[None, :]

    # --- stage 1: Born radii ------------------------------------------------
    U_raw = r + sr_j
    # negative GBn2 sulfur screening can push U <= 0 at close range; those
    # pairs are masked, but NaNs from log(U<=0) would leak through 0*NaN
    inactive = U_raw <= rho_i
    U = jnp.where(inactive, rho_i + 1.0, U_raw)
    absd = jnp.abs(r - sr_j)
    sgn = jnp.sign(r - sr_j)
    use_rho = absd < rho_i
    L = jnp.where(use_rho, rho_i, absd)
    dL = jnp.where(use_rho, 0.0, sgn)
    inv_L = 1.0 / L
    inv_U = 1.0 / U
    log_LU = jnp.log(L * inv_U)
    quad = r - sr_j * sr_j * inv_r
    H = (
        inv_L - inv_U
        + 0.25 * quad * (inv_U * inv_U - inv_L * inv_L)
        + 0.5 * log_LU * inv_r
    )
    engulfed = (sr_j - r) > rho_i
    H = H + jnp.where(engulfed, 2.0 * (1.0 / rho_i - inv_L), 0.0)
    active = (~inactive).astype(r.dtype) * one
    I = 0.5 * jnp.sum(H * active, axis=1)

    # dH/dr (same masks; step functions have zero derivative a.e.)
    dquad = 1.0 + sr_j * sr_j * (inv_r * inv_r)
    dH = (
        -dL * inv_L * inv_L
        + inv_U * inv_U
        + 0.25 * dquad * (inv_U * inv_U - inv_L * inv_L)
        + 0.25 * quad * (-2.0 * inv_U**3 + 2.0 * dL * inv_L**3)
        - 0.5 * log_LU * inv_r * inv_r
        + 0.5 * inv_r * (dL * inv_L - inv_U)
    )
    dH = dH + jnp.where(engulfed, 2.0 * dL * inv_L * inv_L, 0.0)
    dIdr = 0.5 * dH * active                    # (i, j): dI_i/dr_ij

    if p.neck_scale != 0.0 and p.neck_m0 is not None:
        from .gbn2 import neck_value_and_derivative

        nv, dnv = neck_value_and_derivative(r, p.neck_d0, p.neck_m0)
        I = I + p.neck_scale * jnp.sum(nv * one, axis=1)
        dIdr = dIdr + p.neck_scale * dnv * one

    psi = I * p.gb_rho
    g = p.gb_alpha * psi - p.gb_beta * psi**2 + p.gb_gamma * psi**3
    t = jnp.tanh(g)
    inv_B = 1.0 / p.gb_rho - t / p.gb_radii
    inv_B = jnp.maximum(inv_B, 1e-3)
    B = 1.0 / inv_B
    gprime = p.gb_alpha - 2.0 * p.gb_beta * psi + 3.0 * p.gb_gamma * psi**2
    dB_dpsi = B * B * (1.0 - t * t) * gprime / p.gb_radii

    # --- stage 2: GB energy ---------------------------------------------------
    BB = B[:, None] * B[None, :]
    u = r * r / (4.0 * BB)
    expu = jnp.exp(-u)
    f2 = r * r + BB * expu
    f = jnp.sqrt(f2)
    inv_f = 1.0 / f
    # full double sum over ordered pairs (i != j) + diagonal self term
    e_cross_mat = p.qq_full * inv_f * one
    e_cross = jnp.sum(e_cross_mat)
    e_self = jnp.sum(p.gb_pref * p.q * p.q / B)
    e_sa = jnp.sum(p.sa_coef / B**6)
    energy = e_cross + e_self + e_sa

    # dE/dr at fixed B: dE/df * df/dr; df/dr = r (1 - expu/4) / f
    dEdf = -p.qq_full * inv_f * inv_f * one
    dfdr = r * (1.0 - 0.25 * expu) * inv_f
    G_direct = dEdf * dfdr                       # ordered entries

    # dE/dB_i: cross pairs (factor 2: B_i appears in rows and columns),
    # self term, SA term
    dfdBi = expu * (B[None, :] + r * r / (4.0 * B[:, None])) * (0.5 * inv_f)
    dEdB = (
        2.0 * jnp.sum(dEdf * dfdBi, axis=1)
        - p.gb_pref * p.q * p.q / (B * B)
        - 6.0 * p.sa_coef / B**7
    )
    # chain to pair distances: dE/dr_ij += dEdB_i * dB_i/dpsi_i * rho_i * dI_i/dr_ij
    chain_i = (dEdB * dB_dpsi * p.gb_rho)[:, None] * dIdr   # (i, j) ordered
    # ordered coefficient matrix G with the convention that the force
    # assembly symmetrizes (uses G + G^T). The GB double sum carries its
    # 1/2 inside gb_pref, so G_direct enters at full weight — unlike the
    # nonbonded path where the explicit 0.5 energy prefactor halves it.
    G = G_direct + chain_i
    return energy, G


def energy_and_forces(
    p: DenseParams, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Total potential energy and forces for one configuration (N, 3)."""
    diff = x[:, None, :] - x[None, :, :]
    eye = jnp.eye(x.shape[0], dtype=x.dtype)
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS) + eye
    inv_r = 1.0 / r

    e_b, f_b = _bond_energy_forces(p, x)
    e_a, f_a = _angle_energy_forces(p, x)
    e_t, f_t = _torsion_energy_forces(p, x)
    e_nb, G_nb = _nonbonded_energy_pair_coef(p, r, inv_r)
    energy = e_b + e_a + e_t + e_nb
    G = G_nb
    if p.use_gb:
        e_gb, G_gb = _gb_energy_pair_coef(p, r, inv_r, eye)
        energy = energy + e_gb
        G = G + G_gb
    # pairwise force assembly: F_i = -sum_j (G_ij + G_ji) (x_i - x_j)/r_ij
    coef = (G + G.T) * inv_r * (1.0 - eye)
    f_pair = -(jnp.sum(coef, axis=1)[:, None] * x - _mm(coef, x))
    forces = f_b + f_a + f_t + f_pair
    return energy, forces


__all__ = ["DenseParams", "make_dense_params", "energy_and_forces"]
