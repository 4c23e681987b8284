"""Fused multi-step Langevin kernel in Pallas: a whole MD chunk per launch.

The XLA path executes ~100 small kernels per MD step (bonded matmuls,
pairwise stages, integrator ops); at 22-704 atoms every one of them is
latency-bound. This kernel runs K BAOAB steps for ALL replicas inside one
``pallas_call``: state lives in VMEM/registers, forces are the analytic
dense math of md/analytic.py re-laid-out for the TPU vector unit, and
Gaussian noise comes from the on-core PRNG (Box-Muller over
``pltpu.prng_random_bits``).

Layout choices (see pallas_guide.md):
- positions/velocities as (3, R, N): dimension-sliced 2D (R, N) planes keep
  every elementwise op on well-formed (sublane, lane) tiles and make
  "vector" math three plane-ops instead of 3D tensors with a lane dim of 3.
- ALL bonded gathers/scatters are two packed matmuls per dimension: the
  one-hot selector rows of every bond/angle/torsion endpoint are stacked
  into single (K_sel, N) matrices, so gather = x_d @ S_all^T and scatter =
  f_all @ S_all, regardless of how many term types exist.
- pairwise stages are (R, N, N) tensors (leading replica dim untiled).

Correctness gate: tests/unit/test_pallas_md.py compares one chunk against
the pure-XLA integrator step-for-step with matched noise disabled
(friction=0 -> deterministic velocity-Verlet limit) and statistically with
noise on.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
from .analytic import DenseParams, make_dense_params
from .ff_params import OBC2_ALPHA, OBC2_BETA, OBC2_GAMMA
from .system import System

_EPS = 1e-12


# --- packed selector construction (host-side) -----------------------------------

def _pack_selectors(p: DenseParams):
    """Stack every bonded endpoint selector into one (K, N) matrix.

    Row blocks: [bond_s1, bond_s2, angle_s1..s3, tor_s1..s4]. Returns
    (S_all, offsets) where offsets mark block starts.
    """
    blocks = [
        np.asarray(p.bond_s1), np.asarray(p.bond_s2),
        np.asarray(p.angle_s1), np.asarray(p.angle_s2), np.asarray(p.angle_s3),
        np.asarray(p.tor_s1), np.asarray(p.tor_s2), np.asarray(p.tor_s3),
        np.asarray(p.tor_s4),
    ]
    sizes = [b.shape[0] for b in blocks]
    offsets = np.cumsum([0] + sizes)
    return np.concatenate(blocks, axis=0).astype(np.float32), offsets


def _torsion_n_masks(tor_n: np.ndarray) -> np.ndarray:
    """(4, NT) one-hot periodicity masks for n in 1..4."""
    n = np.rint(tor_n).astype(int)
    if not np.isin(n, [1, 2, 3, 4]).all():
        raise ValueError(f"torsion periodicities outside 1..4: {sorted(set(n))}")
    masks = np.zeros((4, len(n)), dtype=np.float32)
    for k in range(1, 5):
        masks[k - 1, n == k] = 1.0
    return masks


def _torsion_signs(tor_phase: np.ndarray) -> np.ndarray:
    """cos(gamma) for gamma restricted to exactly {0, pi} (amber tables)."""
    phase = np.asarray(tor_phase)
    is_zero = np.isclose(phase, 0.0, atol=1e-6)
    is_pi = np.isclose(np.abs(phase), np.pi, atol=1e-6)
    if not np.all(is_zero | is_pi):
        raise ValueError("torsion phases must be exactly 0 or pi for the kernel")
    return np.where(is_zero, 1.0, -1.0).astype(np.float32)


def _normal_from_bits(shape) -> jax.Array:
    """Standard normals via Box-Muller over the on-core PRNG."""
    from jax.experimental.pallas import tpu as pltpu

    bits1 = pltpu.prng_random_bits(shape)
    bits2 = pltpu.prng_random_bits(shape)
    # uint32 -> (0, 1); offset avoids log(0)
    u1 = (bits1.astype(jnp.float32) + 0.5) * (1.0 / 4294967296.0) + 0.5
    u1 = jnp.where(u1 >= 1.0, u1 - 1.0, u1)
    u1 = jnp.maximum(u1, 1e-7)
    u2 = (bits2.astype(jnp.float32) + 0.5) * (1.0 / 4294967296.0) + 0.5
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


def _forces_planes(x0, x1, x2, c):
    """Analytic forces in dimension-plane layout.

    x_d: (R, N). ``c`` is the dict of constant arrays (closed over, baked
    as compile-time constants into the kernel). Returns (f0, f1, f2, energy)
    with f_d (R, N), energy (R,).
    """
    N = x0.shape[-1]
    # --- bonded gathers: one packed matmul per dimension ---------------------
    # (HIGHEST precision: MXU bf16 rounding would corrupt gathered coords)
    _dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ST = c["S_all"].T                                  # (N, K)
    g0 = _dot(x0, ST)                                  # (R, K)
    g1 = _dot(x1, ST)
    g2 = _dot(x2, ST)
    o = c["offsets"]

    def blk(g, i):
        return g[:, o[i]:o[i + 1]]

    # --- bonds ---------------------------------------------------------------
    d0 = blk(g0, 0) - blk(g0, 1)
    d1 = blk(g1, 0) - blk(g1, 1)
    d2 = blk(g2, 0) - blk(g2, 1)
    r = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2 + _EPS)
    dr = r - c["bond_r0"]
    e_bond = jnp.sum(0.5 * c["bond_k"] * dr * dr, axis=1, keepdims=True)
    coefb = -(c["bond_k"] * dr / r)
    fb0_1, fb1_1, fb2_1 = coefb * d0, coefb * d1, coefb * d2

    # --- angles ----------------------------------------------------------------
    ui0 = blk(g0, 2) - blk(g0, 3)
    ui1 = blk(g1, 2) - blk(g1, 3)
    ui2 = blk(g2, 2) - blk(g2, 3)
    wi0 = blk(g0, 4) - blk(g0, 3)
    wi1 = blk(g1, 4) - blk(g1, 3)
    wi2 = blk(g2, 4) - blk(g2, 3)
    lu = jnp.sqrt(ui0**2 + ui1**2 + ui2**2 + _EPS)
    lw = jnp.sqrt(wi0**2 + wi1**2 + wi2**2 + _EPS)
    dotuw = ui0 * wi0 + ui1 * wi1 + ui2 * wi2
    luw = lu * lw
    cos_t = jnp.clip(dotuw / luw, -1.0 + 1e-7, 1.0 - 1e-7)
    # arccos/atan2 are not lowered on TPU Pallas: recover theta by Newton
    # iteration on cos(theta) = c (bond angles live mid-range, far from the
    # sin(theta) ~ 0 poles, so 4 iterations reach f32 exactness)
    theta = 0.5 * jnp.pi - cos_t * (1.0 + cos_t * cos_t * (1.0 / 6.0))
    for _ in range(4):
        theta = theta + (jnp.cos(theta) - cos_t) / jnp.maximum(
            jnp.sin(theta), 1e-6
        )
    sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    dEa = c["angle_k"] * (theta - c["angle_t0"])
    e_angle = jnp.sum(
        0.5 * c["angle_k"] * (theta - c["angle_t0"]) ** 2, axis=1, keepdims=True
    )
    ilus = 1.0 / (lu * sin_t)
    ilws = 1.0 / (lw * sin_t)
    inv_lu, inv_lw = 1.0 / lu, 1.0 / lw
    # dtheta/dxi = (cos*nu - nw)/(lu sin); nu = u/lu
    gi0 = (cos_t * ui0 * inv_lu - wi0 * inv_lw) * ilus
    gi1 = (cos_t * ui1 * inv_lu - wi1 * inv_lw) * ilus
    gi2 = (cos_t * ui2 * inv_lu - wi2 * inv_lw) * ilus
    gk0 = (cos_t * wi0 * inv_lw - ui0 * inv_lu) * ilws
    gk1 = (cos_t * wi1 * inv_lw - ui1 * inv_lu) * ilws
    gk2 = (cos_t * wi2 * inv_lw - ui2 * inv_lu) * ilws
    fa_i0, fa_i1, fa_i2 = -dEa * gi0, -dEa * gi1, -dEa * gi2
    fa_k0, fa_k1, fa_k2 = -dEa * gk0, -dEa * gk1, -dEa * gk2
    fa_j0, fa_j1, fa_j2 = -(fa_i0 + fa_k0), -(fa_i1 + fa_k1), -(fa_i2 + fa_k2)

    # --- torsions ---------------------------------------------------------------
    b1_0 = blk(g0, 6) - blk(g0, 5)
    b1_1 = blk(g1, 6) - blk(g1, 5)
    b1_2 = blk(g2, 6) - blk(g2, 5)
    b2_0 = blk(g0, 7) - blk(g0, 6)
    b2_1 = blk(g1, 7) - blk(g1, 6)
    b2_2 = blk(g2, 7) - blk(g2, 6)
    b3_0 = blk(g0, 8) - blk(g0, 7)
    b3_1 = blk(g1, 8) - blk(g1, 7)
    b3_2 = blk(g2, 8) - blk(g2, 7)
    # m = b1 x b2 ; n = b2 x b3 (per-dimension expansion)
    m0 = b1_1 * b2_2 - b1_2 * b2_1
    m1 = b1_2 * b2_0 - b1_0 * b2_2
    m2 = b1_0 * b2_1 - b1_1 * b2_0
    n0 = b2_1 * b3_2 - b2_2 * b3_1
    n1 = b2_2 * b3_0 - b2_0 * b3_2
    n2 = b2_0 * b3_1 - b2_1 * b3_0
    lb2 = jnp.sqrt(b2_0**2 + b2_1**2 + b2_2**2 + _EPS)
    m2sq = m0 * m0 + m1 * m1 + m2 * m2 + _EPS
    n2sq = n0 * n0 + n1 * n1 + n2 * n2 + _EPS
    # phi = atan2((m x b2hat) . n, m . n)
    inv_lb2 = 1.0 / lb2
    c0 = (m1 * b2_2 - m2 * b2_1) * inv_lb2
    c1 = (m2 * b2_0 - m0 * b2_2) * inv_lb2
    c2_ = (m0 * b2_1 - m1 * b2_0) * inv_lb2
    # IUPAC sign: (m x b2hat).n == -(m x n).b2hat, so negate (matches
    # features/builtins.py; the paired lm/ln negation below keeps forces
    # bit-identical — energies are even in phi for amber phases)
    yy = -(c0 * n0 + c1 * n1 + c2_ * n2)
    xx = m0 * n0 + m1 * n1 + m2 * n2
    # E = k (1 + cos(n phi - gamma)) with integer n in 1..4 and gamma in
    # {0, pi}: expand cos(n phi) / sin(n phi) by multiple-angle recurrences
    # from (cos phi, sin phi) -- NO transcendentals, no atan2 needed.
    norm = jnp.sqrt(xx * xx + yy * yy + _EPS)
    cph = xx / norm
    sph = yy / norm
    c2p = 2.0 * cph * cph - 1.0
    s2p = 2.0 * sph * cph
    c3p = cph * c2p - sph * s2p
    s3p = sph * c2p + cph * s2p
    c4p = 2.0 * c2p * c2p - 1.0
    s4p = 2.0 * s2p * c2p
    mask_n = c["tor_nmask"]                      # (4, NT): one-hot in n
    cos_n = (
        mask_n[0:1] * cph + mask_n[1:2] * c2p
        + mask_n[2:3] * c3p + mask_n[3:4] * c4p
    )
    sin_n = (
        mask_n[0:1] * sph + mask_n[1:2] * s2p
        + mask_n[2:3] * s3p + mask_n[3:4] * s4p
    )
    sign = c["tor_sign"]                          # (1, NT): cos(gamma)
    e_tor = jnp.sum(
        c["tor_k"] * (1.0 + sign * cos_n), axis=1, keepdims=True
    )
    dEt = -c["tor_k"] * c["tor_n"] * sign * sin_n
    lm = -lb2 / m2sq   # IUPAC phi gradients (negated with yy above)
    ln = -lb2 / n2sq
    d1p0, d1p1, d1p2 = lm * m0, lm * m1, lm * m2
    d4p0, d4p1, d4p2 = -ln * n0, -ln * n1, -ln * n2
    s12 = (b1_0 * b2_0 + b1_1 * b2_1 + b1_2 * b2_2) / (lb2 * lb2)
    s32 = (b3_0 * b2_0 + b3_1 * b2_1 + b3_2 * b2_2) / (lb2 * lb2)
    d2p0 = -(1.0 + s12) * d1p0 + s32 * d4p0
    d2p1 = -(1.0 + s12) * d1p1 + s32 * d4p1
    d2p2 = -(1.0 + s12) * d1p2 + s32 * d4p2
    d3p0 = s12 * d1p0 - (1.0 + s32) * d4p0
    d3p1 = s12 * d1p1 - (1.0 + s32) * d4p1
    d3p2 = s12 * d1p2 - (1.0 + s32) * d4p2
    ft1_0, ft1_1, ft1_2 = -dEt * d1p0, -dEt * d1p1, -dEt * d1p2
    ft2_0, ft2_1, ft2_2 = -dEt * d2p0, -dEt * d2p1, -dEt * d2p2
    ft3_0, ft3_1, ft3_2 = -dEt * d3p0, -dEt * d3p1, -dEt * d3p2
    ft4_0, ft4_1, ft4_2 = -dEt * d4p0, -dEt * d4p1, -dEt * d4p2

    # --- packed scatter: f_all (R, K) @ S_all (K, N), per dimension -----------
    def scatter(fb, fai, faj, fak, ft1, ft2, ft3, ft4):
        f_all = jnp.concatenate(
            [fb, -fb, fai, faj, fak, ft1, ft2, ft3, ft4], axis=1
        )
        return _dot(f_all, c["S_all"])

    fB0 = scatter(fb0_1, fa_i0, fa_j0, fa_k0, ft1_0, ft2_0, ft3_0, ft4_0)
    fB1 = scatter(fb1_1, fa_i1, fa_j1, fa_k1, ft1_1, ft2_1, ft3_1, ft4_1)
    fB2 = scatter(fb2_1, fa_i2, fa_j2, fa_k2, ft1_2, ft2_2, ft3_2, ft4_2)

    if c.get("skip_pairs"):
        return fB0, fB1, fB2, e_bond + e_angle + e_tor

    # --- pairwise stages (R, N, N) ---------------------------------------------
    dd0 = x0[:, :, None] - x0[:, None, :]
    dd1 = x1[:, :, None] - x1[:, None, :]
    dd2 = x2[:, :, None] - x2[:, None, :]
    eye = c["eye"]                                     # (N, N)
    r2 = dd0 * dd0 + dd1 * dd1 + dd2 * dd2 + _EPS
    rp = jnp.sqrt(r2) + eye[None, :, :]
    inv_r = 1.0 / rp
    inv_r2 = inv_r * inv_r
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r12 = inv_r6 * inv_r6
    lj_a, lj_b, qq_s = c["lj_a"], c["lj_b"], c["qq_scaled"]
    e_nb = 0.5 * jnp.sum(
        jnp.sum(lj_a * inv_r12 - lj_b * inv_r6 + qq_s * inv_r, axis=2),
        axis=1, keepdims=True,
    )
    Gnb = 0.5 * (
        -12.0 * lj_a * inv_r12 * inv_r
        + 6.0 * lj_b * inv_r6 * inv_r
        - qq_s * inv_r2
    )
    energy = e_bond + e_angle + e_tor + e_nb
    G = Gnb

    if c["use_gb"]:
        rho_i = c["gb_rho"][:, :, None]                # (1, N, 1)
        sr_j = c["gb_sr"][:, None, :]                  # (1, 1, N)
        U_raw = rp + sr_j
        # GBn2 sulfur screening is negative: sanitize U<=rho_i pairs
        # (masked below) so log() cannot produce NaN
        inactive_gb = U_raw <= rho_i
        U = jnp.where(inactive_gb, rho_i + 1.0, U_raw)
        absd = jnp.abs(rp - sr_j)
        sgn = jnp.sign(rp - sr_j)
        use_rho = absd < rho_i
        L = jnp.where(use_rho, rho_i, absd)
        dL = jnp.where(use_rho, 0.0, sgn)
        inv_L = 1.0 / L
        inv_U = 1.0 / U
        log_LU = jnp.log(L * inv_U)
        quad = rp - sr_j * sr_j * inv_r
        H = (
            inv_L - inv_U
            + 0.25 * quad * (inv_U * inv_U - inv_L * inv_L)
            + 0.5 * log_LU * inv_r
        )
        engulfed = (sr_j - rp) > rho_i
        H = H + jnp.where(engulfed, 2.0 * (1.0 / rho_i - inv_L), 0.0)
        active = (1.0 - inactive_gb.astype(jnp.float32)) * (1.0 - eye)[None, :, :]
        I = 0.5 * jnp.sum(H * active, axis=2)          # (R, N)
        dquad = 1.0 + sr_j * sr_j * inv_r2
        dH = (
            -dL * inv_L * inv_L
            + inv_U * inv_U
            + 0.25 * dquad * (inv_U * inv_U - inv_L * inv_L)
            + 0.25 * quad * (-2.0 * inv_U**3 + 2.0 * dL * inv_L**3)
            - 0.5 * log_LU * inv_r2
            + 0.5 * inv_r * (dL * inv_L - inv_U)
        )
        dH = dH + jnp.where(engulfed, 2.0 * dL * inv_L * inv_L, 0.0)
        dIdr = 0.5 * dH * active

        if c.get("use_neck"):
            # GBn2 neck correction (md/gbn2.py): I += s * m0/(1+100 u^2 +
            # 0.3e6 u^6) with u = r - d0; derivative folds into dIdr
            d0 = c["neck_d0"]                          # (1, N, N)
            m0s = c["neck_m0"]                         # pre-scaled by s
            u_nk = rp - d0
            u2 = u_nk * u_nk
            denom = 1.0 + 100.0 * u2 + 0.3e6 * u2 * u2 * u2
            nv = m0s / denom
            one3 = (1.0 - eye)[None, :, :]
            I = I + jnp.sum(nv * one3, axis=2)
            dIdr = dIdr - (nv / denom) * (
                200.0 * u_nk + 1.8e6 * u2 * u2 * u_nk
            ) * one3

        psi = I * c["gb_rho"]                          # (R, N) * (1, N)
        al, be, ga = c["gb_alpha"], c["gb_beta"], c["gb_gamma"]
        g = al * psi - be * psi**2 + ga * psi**3
        t = jnp.tanh(g)
        inv_B = 1.0 / c["gb_rho"] - t / c["gb_radii"]
        inv_B = jnp.maximum(inv_B, 1e-3)
        B = 1.0 / inv_B
        gprime = al - 2.0 * be * psi + 3.0 * ga * psi**2
        dB_dpsi = B * B * (1.0 - t * t) * gprime / c["gb_radii"]

        BB = B[:, :, None] * B[:, None, :]
        u = r2 / (4.0 * BB)
        expu = jnp.exp(-u)
        f2 = rp * rp + BB * expu
        fgb = jnp.sqrt(f2)
        inv_f = 1.0 / fgb
        one = (1.0 - eye)[None, :, :]
        qq_full = c["qq_full"][None, :, :]
        e_cross = jnp.sum(
            jnp.sum(qq_full * inv_f * one, axis=2), axis=1, keepdims=True
        )
        q2 = c["q"] * c["q"]                           # (1, N)
        e_self = jnp.sum(c["gb_pref"] * q2 * inv_B, axis=1, keepdims=True)
        e_sa = jnp.sum(c["sa_coef"] * inv_B**6, axis=1, keepdims=True)
        energy = energy + e_cross + e_self + e_sa

        dEdf = -qq_full * inv_f * inv_f * one
        dfdr = rp * (1.0 - 0.25 * expu) * inv_f
        G_direct = dEdf * dfdr
        dfdBi = expu * (B[:, None, :] + r2 / (4.0 * B[:, :, None])) * (0.5 * inv_f)
        dEdB = (
            2.0 * jnp.sum(dEdf * dfdBi, axis=2)
            - c["gb_pref"] * q2 * inv_B * inv_B
            - 6.0 * c["sa_coef"] * inv_B**7
        )
        chain = (dEdB * dB_dpsi * c["gb_rho"])[:, :, None] * dIdr
        G = G + G_direct + chain

    # pairwise force assembly: F_i = -sum_j (G_ij + G_ji)(x_i - x_j)/r
    coef = (G + jnp.swapaxes(G, 1, 2)) * inv_r * (1.0 - eye)[None, :, :]
    row = jnp.sum(coef, axis=2)                        # (R, N)
    fP0 = -(row * x0 - jnp.sum(coef * x0[:, None, :], axis=2))
    fP1 = -(row * x1 - jnp.sum(coef * x1[:, None, :], axis=2))
    fP2 = -(row * x2 - jnp.sum(coef * x2[:, None, :], axis=2))

    return fB0 + fP0, fB1 + fP1, fB2 + fP2, energy


def _cv_forward(x0, x1, x2, c):
    """positions planes -> DeepTICA CV values y (R, n_cv) (shared by the
    bias force path and the in-kernel hill-deposit path)."""
    _dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    SB = c["bias_S"]
    M = c["bias_n_dihedrals"]
    g0 = _dot(x0, SB.T)
    g1 = _dot(x1, SB.T)
    g2 = _dot(x2, SB.T)

    def q(g, k):
        return g[:, k * M:(k + 1) * M]

    b1_0 = q(g0, 1) - q(g0, 0)
    b1_1 = q(g1, 1) - q(g1, 0)
    b1_2 = q(g2, 1) - q(g2, 0)
    b2_0 = q(g0, 2) - q(g0, 1)
    b2_1 = q(g1, 2) - q(g1, 1)
    b2_2 = q(g2, 2) - q(g2, 1)
    b3_0 = q(g0, 3) - q(g0, 2)
    b3_1 = q(g1, 3) - q(g1, 2)
    b3_2 = q(g2, 3) - q(g2, 2)
    m0 = b1_1 * b2_2 - b1_2 * b2_1
    m1 = b1_2 * b2_0 - b1_0 * b2_2
    m2 = b1_0 * b2_1 - b1_1 * b2_0
    n0 = b2_1 * b3_2 - b2_2 * b3_1
    n1 = b2_2 * b3_0 - b2_0 * b3_2
    n2 = b2_0 * b3_1 - b2_1 * b3_0
    lb2 = jnp.sqrt(b2_0**2 + b2_1**2 + b2_2**2 + _EPS)
    inv_lb2 = 1.0 / lb2
    c0 = (m1 * b2_2 - m2 * b2_1) * inv_lb2
    c1 = (m2 * b2_0 - m0 * b2_2) * inv_lb2
    c2_ = (m0 * b2_1 - m1 * b2_0) * inv_lb2
    yy = -(c0 * n0 + c1 * n1 + c2_ * n2)   # IUPAC sign (builtins.py)
    xx = m0 * n0 + m1 * n1 + m2 * n2
    norm = jnp.sqrt(xx * xx + yy * yy + _EPS)
    feats = jnp.concatenate([xx / norm, yy / norm], axis=1)
    z = (feats - c["bias_mu"]) * c["bias_inv_sigma"]
    h = z
    n_layers = c["bias_n_layers"]
    for li in range(n_layers - 1):
        h = jnp.tanh(_dot(h, c[f"bias_w{li}"]) + c[f"bias_b{li}"])
    y = _dot(h, c[f"bias_w{n_layers - 1}"]) + c[f"bias_b{n_layers - 1}"]
    if c["bias_whiten"]:
        y = _dot(y - c["bias_wmean"], c["bias_wmat"])
    return y


def _bias_planes(x0, x1, x2, c):
    """DeepTICA harmonic-expansion bias INSIDE the kernel: energy and
    analytic forces, per replica plane layout.

    Chain: positions -> phi/psi dihedrals (cos/sin, no transcendentals) ->
    standardize -> tanh MLP -> optional whitening -> E = k sum(cv^2).
    The gradient is hand-written backprop (tanh derivative, linear
    transposes) chained through the analytic dihedral gradient formulas —
    the same math jax.grad produces on the XLA path, now fused into the
    multi-step kernel. Returns (f0, f1, f2, e_bias (R, 1)).
    """
    _dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    SB = c["bias_S"]                 # (4*M, N) packed quad selectors
    M = c["bias_n_dihedrals"]
    g0 = _dot(x0, SB.T)              # (R, 4M)
    g1 = _dot(x1, SB.T)
    g2 = _dot(x2, SB.T)

    def q(g, k):
        return g[:, k * M:(k + 1) * M]

    b1_0 = q(g0, 1) - q(g0, 0)
    b1_1 = q(g1, 1) - q(g1, 0)
    b1_2 = q(g2, 1) - q(g2, 0)
    b2_0 = q(g0, 2) - q(g0, 1)
    b2_1 = q(g1, 2) - q(g1, 1)
    b2_2 = q(g2, 2) - q(g2, 1)
    b3_0 = q(g0, 3) - q(g0, 2)
    b3_1 = q(g1, 3) - q(g1, 2)
    b3_2 = q(g2, 3) - q(g2, 2)
    m0 = b1_1 * b2_2 - b1_2 * b2_1
    m1 = b1_2 * b2_0 - b1_0 * b2_2
    m2 = b1_0 * b2_1 - b1_1 * b2_0
    n0 = b2_1 * b3_2 - b2_2 * b3_1
    n1 = b2_2 * b3_0 - b2_0 * b3_2
    n2 = b2_0 * b3_1 - b2_1 * b3_0
    lb2 = jnp.sqrt(b2_0**2 + b2_1**2 + b2_2**2 + _EPS)
    m2sq = m0 * m0 + m1 * m1 + m2 * m2 + _EPS
    n2sq = n0 * n0 + n1 * n1 + n2 * n2 + _EPS
    inv_lb2 = 1.0 / lb2
    c0 = (m1 * b2_2 - m2 * b2_1) * inv_lb2
    c1 = (m2 * b2_0 - m0 * b2_2) * inv_lb2
    c2_ = (m0 * b2_1 - m1 * b2_0) * inv_lb2
    yy = -(c0 * n0 + c1 * n1 + c2_ * n2)   # IUPAC sign (builtins.py)
    xx = m0 * n0 + m1 * n1 + m2 * n2
    norm = jnp.sqrt(xx * xx + yy * yy + _EPS)
    cph = xx / norm                   # cos(phi)   (R, M)
    sph = yy / norm                   # sin(phi)

    # features -> standardized input
    feats = jnp.concatenate([cph, sph], axis=1)           # (R, 2M)
    z = (feats - c["bias_mu"]) * c["bias_inv_sigma"]

    # tanh MLP forward, keeping activations for backprop
    hs = [z]
    h = z
    n_layers = c["bias_n_layers"]
    for li in range(n_layers - 1):
        h = jnp.tanh(_dot(h, c[f"bias_w{li}"]) + c[f"bias_b{li}"])
        hs.append(h)
    y = _dot(h, c[f"bias_w{n_layers - 1}"]) + c[f"bias_b{n_layers - 1}"]
    if c["bias_whiten"]:
        y = _dot(y - c["bias_wmean"], c["bias_wmat"])

    if c["bias_kind"] == "metadynamics":
        # hills ledger (runtime values, TRANSPOSED layout: lanes = hills):
        # E = sum_h height_h exp(-0.5 |d_h|^2), d_h = (cv - center_h)/sigma
        centersT = c["mtd_centers_t"]         # (n_cv, H)
        heights = c["mtd_heights"]            # (1, H)
        mask = c["mtd_mask"]                  # (1, H): valid-hill prefix
        n_cv = centersT.shape[0]
        inv_sig = c["mtd_inv_sigma_list"]     # static python list of floats
        d_ks = []
        d2 = None
        for k in range(n_cv):
            d_k = (y[:, k:k + 1] - centersT[k:k + 1, :]) * inv_sig[k]  # (R, H)
            d_ks.append(d_k)
            d2 = d_k * d_k if d2 is None else d2 + d_k * d_k
        g = jnp.exp(-0.5 * d2)                # (R, H)
        wh = heights * mask
        e_bias = jnp.sum(wh * g, axis=1, keepdims=True)
        grad = jnp.concatenate(
            [
                -jnp.sum(wh * g * d_ks[k], axis=1, keepdims=True) * inv_sig[k]
                for k in range(n_cv)
            ],
            axis=1,
        )                                      # (R, n_cv)
    else:
        e_bias = c["bias_strength"] * jnp.sum(y * y, axis=1, keepdims=True)
        grad = 2.0 * c["bias_strength"] * y

    # backprop to features
    if c["bias_whiten"]:
        grad = _dot(grad, c["bias_wmat"].T)
    grad = _dot(grad, c[f"bias_w{n_layers - 1}"].T)
    for li in range(n_layers - 2, -1, -1):
        grad = grad * (1.0 - hs[li + 1] * hs[li + 1])
        grad = _dot(grad, c[f"bias_w{li}"].T)
    grad_feats = grad * c["bias_inv_sigma"]               # (R, 2M)
    g_cos = grad_feats[:, :M]
    g_sin = grad_feats[:, M:]
    # dE/dphi = -sin*g_cos + cos*g_sin
    dEdphi = -sph * g_cos + cph * g_sin

    # dihedral gradients (same formulas as the torsion force path;
    # negated with yy for the IUPAC convention)
    lm = -lb2 / m2sq
    ln = -lb2 / n2sq
    d1p0, d1p1, d1p2 = lm * m0, lm * m1, lm * m2
    d4p0, d4p1, d4p2 = -ln * n0, -ln * n1, -ln * n2
    s12 = (b1_0 * b2_0 + b1_1 * b2_1 + b1_2 * b2_2) / (lb2 * lb2)
    s32 = (b3_0 * b2_0 + b3_1 * b2_1 + b3_2 * b2_2) / (lb2 * lb2)
    d2p0 = -(1.0 + s12) * d1p0 + s32 * d4p0
    d2p1 = -(1.0 + s12) * d1p1 + s32 * d4p1
    d2p2 = -(1.0 + s12) * d1p2 + s32 * d4p2
    d3p0 = s12 * d1p0 - (1.0 + s32) * d4p0
    d3p1 = s12 * d1p1 - (1.0 + s32) * d4p1
    d3p2 = s12 * d1p2 - (1.0 + s32) * d4p2

    def scatter(dE, p1, p2, p3, p4):
        f_all = jnp.concatenate(
            [-dE * p1, -dE * p2, -dE * p3, -dE * p4], axis=1
        )
        return _dot(f_all, SB)

    f0 = scatter(dEdphi, d1p0, d2p0, d3p0, d4p0)
    f1 = scatter(dEdphi, d1p1, d2p1, d3p1, d4p1)
    f2 = scatter(dEdphi, d1p2, d2p2, d3p2, d4p2)
    return f0, f1, f2, e_bias


def _bias_consts(model, quads: np.ndarray, strength: float):
    """Bake a DeepTICAModel + dihedral quads into kernel constants."""
    cfg = model.config
    if cfg.activation != "tanh":
        raise ValueError(
            f"in-kernel bias supports tanh MLPs, got {cfg.activation!r}"
        )
    if cfg.layernorm:
        raise ValueError("in-kernel bias does not support layernorm")
    quads = np.asarray(quads, dtype=np.int64)
    M = quads.shape[0]
    consts = {}
    sigma = np.asarray(model.scaler_scale, np.float32)
    consts["bias_mu"] = np.asarray(model.scaler_mean, np.float32)[None, :]
    consts["bias_inv_sigma"] = (1.0 / sigma)[None, :]
    for li, layer in enumerate(model.params):
        consts[f"bias_w{li}"] = np.asarray(layer["w"], np.float32)
        consts[f"bias_b{li}"] = np.asarray(layer["b"], np.float32)[None, :]
    statics = {
        "bias_n_layers": len(model.params),
        "bias_n_dihedrals": int(M),
        "bias_strength": float(strength),
        "bias_whiten": model.whitening is not None,
        "bias_kind": "harmonic",   # build_pallas_chunk overrides for metadynamics
    }
    if model.whitening is not None:
        consts["bias_wmean"] = np.asarray(
            model.whitening["mean"], np.float32
        )[None, :]
        consts["bias_wmat"] = np.asarray(
            model.whitening["transform"], np.float32
        )
    return consts, statics, quads


def _pack_selectors_for_quads(quads: np.ndarray, n: int) -> np.ndarray:
    """(4*M, N) one-hot selector: rows [all q1, all q2, all q3, all q4]."""
    M = quads.shape[0]
    S = np.zeros((4 * M, n), dtype=np.float32)
    for k in range(4):
        S[np.arange(M) + k * M, quads[:, k]] = 1.0
    return S


def _pair_pack_matrices(n: int):
    """One-hot matrices for the packed (R, N*N) pair layout.

    RHO (N, P): value at pair column (i*N+j) = a[i]  (broadcast by i)
    TAU (N, P): value at pair column (i*N+j) = a[j]  (broadcast by j)
    SUMJ (P, N): row-sum over j for each i
    (all O(N^3) memory; the pair transpose is avoided analytically in
    _forces_planes_packed, keeping the kernel O(N^2)-state)
    """
    P = n * n
    rho = np.zeros((n, P), dtype=np.float32)
    tau = np.zeros((n, P), dtype=np.float32)
    sumj = np.zeros((P, n), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            col = i * n + j
            rho[i, col] = 1.0
            tau[j, col] = 1.0
            sumj[col, i] = 1.0
    return rho, tau, sumj


def _forces_planes_packed(x0, x1, x2, c):
    """Packed-lane variant of _forces_planes: every pairwise tensor lives
    as (R, N*N) — lanes ~94% utilized at N=22 vs ~17% for the (R, N, N)
    tiling — and j-reductions/transposes run as one-hot MXU matmuls.
    Bonded terms are identical to _forces_planes (delegated)."""
    _dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # bonded terms via the shared path with the pairwise block disabled
    cb = dict(c)
    cb["use_gb"] = False
    cb["skip_pairs"] = True
    fB0, fB1, fB2, e_bonded = _forces_planes(x0, x1, x2, cb)

    RHO, TAU, SUMJ = c["RHO"], c["TAU"], c["SUMJ"]

    def toI(a):
        return _dot(a, RHO)

    def toJ(a):
        return _dot(a, TAU)

    xI0, xJ0 = toI(x0), toJ(x0)
    xI1, xJ1 = toI(x1), toJ(x1)
    xI2, xJ2 = toI(x2), toJ(x2)
    dd0 = xI0 - xJ0
    dd1 = xI1 - xJ1
    dd2 = xI2 - xJ2
    eye_f = c["eye_flat"]                      # (1, P)
    one_f = 1.0 - eye_f
    r2 = dd0 * dd0 + dd1 * dd1 + dd2 * dd2 + _EPS
    rp = jnp.sqrt(r2) + eye_f
    inv_r = 1.0 / rp
    inv_r2 = inv_r * inv_r
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    inv_r12 = inv_r6 * inv_r6
    lj_a, lj_b, qq_s = c["lj_a_flat"], c["lj_b_flat"], c["qq_scaled_flat"]
    e_nb = 0.5 * jnp.sum(
        lj_a * inv_r12 - lj_b * inv_r6 + qq_s * inv_r, axis=1, keepdims=True
    )
    G = 0.5 * (
        -12.0 * lj_a * inv_r12 * inv_r
        + 6.0 * lj_b * inv_r6 * inv_r
        - qq_s * inv_r2
    )
    energy = e_bonded + e_nb

    if c["use_gb"]:
        rho_i = c["gb_rho_flat_i"]             # (1, P) rho broadcast by i
        sr_j = c["gb_sr_flat_j"]               # (1, P) sr broadcast by j
        U_raw = rp + sr_j
        # GBn2 sulfur screening is negative: sanitize U<=rho_i pairs
        # (masked below) so log() cannot produce NaN
        inactive_gb = U_raw <= rho_i
        U = jnp.where(inactive_gb, rho_i + 1.0, U_raw)
        absd = jnp.abs(rp - sr_j)
        sgn = jnp.sign(rp - sr_j)
        use_rho = absd < rho_i
        L = jnp.where(use_rho, rho_i, absd)
        dL = jnp.where(use_rho, 0.0, sgn)
        inv_L = 1.0 / L
        inv_U = 1.0 / U
        log_LU = jnp.log(L * inv_U)
        quad = rp - sr_j * sr_j * inv_r
        H = (
            inv_L - inv_U
            + 0.25 * quad * (inv_U * inv_U - inv_L * inv_L)
            + 0.5 * log_LU * inv_r
        )
        engulfed = (sr_j - rp) > rho_i
        H = H + jnp.where(engulfed, 2.0 * (1.0 / rho_i - inv_L), 0.0)
        active = (1.0 - inactive_gb.astype(jnp.float32)) * one_f
        I = 0.5 * _dot(H * active, SUMJ)       # (R, N)
        dquad = 1.0 + sr_j * sr_j * inv_r2
        dH = (
            -dL * inv_L * inv_L
            + inv_U * inv_U
            + 0.25 * dquad * (inv_U * inv_U - inv_L * inv_L)
            + 0.25 * quad * (-2.0 * inv_U**3 + 2.0 * dL * inv_L**3)
            - 0.5 * log_LU * inv_r2
            + 0.5 * inv_r * (dL * inv_L - inv_U)
        )
        dH = dH + jnp.where(engulfed, 2.0 * dL * inv_L * inv_L, 0.0)
        dIdr = 0.5 * dH * active

        if c.get("use_neck"):
            d0 = c["neck_d0_flat"]                 # (1, P)
            m0s = c["neck_m0_flat"]                # pre-scaled by s
            u_nk = rp - d0
            u2 = u_nk * u_nk
            denom = 1.0 + 100.0 * u2 + 0.3e6 * u2 * u2 * u2
            nv = m0s / denom
            I = I + _dot(nv * one_f, SUMJ)
            dIdr_nk = -(nv / denom) * (
                200.0 * u_nk + 1.8e6 * u2 * u2 * u_nk
            ) * one_f
        else:
            dIdr_nk = None

        psi = I * c["gb_rho"]
        al, be, ga = c["gb_alpha"], c["gb_beta"], c["gb_gamma"]
        g = al * psi - be * psi**2 + ga * psi**3
        t = jnp.tanh(g)
        inv_B = 1.0 / c["gb_rho"] - t / c["gb_radii"]
        inv_B = jnp.maximum(inv_B, 1e-3)
        B = 1.0 / inv_B
        gprime = al - 2.0 * be * psi + 3.0 * ga * psi**2
        dB_dpsi = B * B * (1.0 - t * t) * gprime / c["gb_radii"]

        BiP, BjP = toI(B), toJ(B)
        BB = BiP * BjP
        u = r2 / (4.0 * BB)
        expu = jnp.exp(-u)
        fgb = jnp.sqrt(rp * rp + BB * expu)
        inv_f = 1.0 / fgb
        qq_full = c["qq_full_flat"]
        e_cross = jnp.sum(qq_full * inv_f * one_f, axis=1, keepdims=True)
        q2 = c["q"] * c["q"]
        e_self = jnp.sum(c["gb_pref"] * q2 * inv_B, axis=1, keepdims=True)
        e_sa = jnp.sum(c["sa_coef"] * inv_B**6, axis=1, keepdims=True)
        energy = energy + e_cross + e_self + e_sa

        dEdf = -qq_full * inv_f * inv_f * one_f
        dfdr = rp * (1.0 - 0.25 * expu) * inv_f
        G_direct = dEdf * dfdr
        dfdBi = expu * (BjP + r2 / (4.0 * BiP)) * (0.5 * inv_f)
        dEdB = (
            2.0 * _dot(dEdf * dfdBi, SUMJ)
            - c["gb_pref"] * q2 * inv_B * inv_B
            - 6.0 * c["sa_coef"] * inv_B**7
        )
        dIdr_tot = dIdr if dIdr_nk is None else dIdr + dIdr_nk
        chain = toI(dEdB * dB_dpsi * c["gb_rho"]) * dIdr_tot
        G = G + G_direct + chain

    # Pair-transpose-free force assembly. With u_ij = (x_i - x_j)/r_ij and
    # V_ij = G_ij u_ij:  F_i = -sum_j (G_ij + G_ji) u_ij
    #                        = -rowsum_i(V) + colsum_i(V)
    # (since u_ij = -u_ji). rowsum = V @ SUMJ, colsum = V @ TAU^T — no
    # O(N^4) permutation matrix needed.
    W = G * inv_r * one_f
    TAUT = c["TAUT"]                           # (P, N): col-sums over i
    V0 = W * dd0
    V1 = W * dd1
    V2 = W * dd2
    fP0 = -_dot(V0, SUMJ) + _dot(V0, TAUT)
    fP1 = -_dot(V1, SUMJ) + _dot(V1, TAUT)
    fP2 = -_dot(V2, SUMJ) + _dot(V2, TAUT)
    return fB0 + fP0, fB1 + fP1, fB2 + fP2, energy


def build_pallas_chunk(
    system: System,
    *,
    dt: float,
    friction: float,
    n_steps: int,
    n_replicas: int,
    interpret: bool = False,
    pack_pairs: bool = True,
    replica_block: "int | None" = None,
    bias_model=None,
    bias_quads: "np.ndarray | None" = None,
    bias_strength: float = 1.0,
    bias_kind: str = "harmonic",
    mtd_sigma: "np.ndarray | None" = None,
    mtd_deposit_interval: "int | None" = None,
    mtd_height: float = 1.0,
    mtd_bias_factor: "float | None" = None,
    mtd_temperature_K: float = 300.0,
):
    """Compile a fused K-step Langevin chunk.

    Returns ``chunk(x, v, seeds, temps, *bias_runtime) -> (x, v, energies,
    *ledger)`` with x, v (R, N, 3) float32, seeds (R,) int32, temps (R,)
    float32.

    Medium-N systems (chignolin-scale, N > 64): the packed (R, N*N) pair
    layout auto-disables (its one-hot pack matrices are O(N^3) bytes) and
    the launch runs a GRID over replica blocks of ``replica_block``
    replicas — each grid step holds only one block's (RB, N, N) pair
    temporaries in VMEM, so total state no longer scales with n_replicas.
    TPU grid steps execute sequentially per core, so noise streams stay
    independent via per-block PRNG seeding. ``replica_block=None``
    auto-sizes the block to the VMEM budget.

    Metadynamics modes:
    - ledger-input mode (``mtd_deposit_interval=None``): the hills arrays
      (centers_t (n_cv, H), heights (1, H), mask (1, H)) are runtime
      inputs; deposits happen outside.
    - fully-fused mode (``mtd_deposit_interval=K``): the kernel deposits a
      (well-tempered) hill per replica every K steps INSIDE the launch;
      runtime inputs are (centers_t, heights, count (1, 1)) and the updated
      ledger is returned — an entire metadynamics run is one kernel call.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if pack_pairs and system.n_atoms > 64:
        # the packed layout's win is lane utilization at tiny N; past N=64
        # the (N, N) tiles are well-utilized anyway and the O(N^3) one-hot
        # pack matrices would dominate VMEM
        pack_pairs = False

    p = make_dense_params(system)
    S_all, offsets = _pack_selectors(p)
    # parameter arrays travel as kernel inputs (Pallas forbids captured
    # traced constants); names fix the ref order
    const_arrays = {
        "S_all": np.asarray(S_all, np.float32),
        "bond_k": np.asarray(p.bond_k, np.float32)[None, :],
        "bond_r0": np.asarray(p.bond_r0, np.float32)[None, :],
        "angle_k": np.asarray(p.angle_k, np.float32)[None, :],
        "angle_t0": np.asarray(p.angle_t0, np.float32)[None, :],
        "tor_k": np.asarray(p.tor_k, np.float32)[None, :],
        "tor_n": np.asarray(p.tor_n, np.float32)[None, :],
        "tor_nmask": _torsion_n_masks(np.asarray(p.tor_n)),
        "tor_sign": _torsion_signs(np.asarray(p.tor_phase))[None, :],
        "lj_a": np.asarray(p.lj_a, np.float32)[None, :, :],
        "lj_b": np.asarray(p.lj_b, np.float32)[None, :, :],
        "qq_scaled": np.asarray(p.qq_scaled, np.float32)[None, :, :],
        "qq_full": np.asarray(p.qq_full, np.float32),
        "q": np.asarray(p.q, np.float32)[None, :],
        "gb_rho": np.asarray(p.gb_rho, np.float32)[None, :],
        "gb_sr": np.asarray(p.gb_sr, np.float32)[None, :],
        "gb_radii": np.asarray(p.gb_radii, np.float32)[None, :],
        "gb_alpha": np.asarray(p.gb_alpha, np.float32)[None, :],
        "gb_beta": np.asarray(p.gb_beta, np.float32)[None, :],
        "gb_gamma": np.asarray(p.gb_gamma, np.float32)[None, :],
        "sa_coef": np.asarray(p.sa_coef, np.float32)[None, :],
        "eye": np.eye(system.n_atoms, dtype=np.float32),
        "inv_m": (1.0 / np.asarray(p.masses, np.float32))[None, :],
    }
    if pack_pairs:
        n = system.n_atoms
        RHO, TAU, SUMJ = _pair_pack_matrices(n)
        flat = lambda m: np.asarray(m, np.float32).reshape(1, n * n)
        rho_col = np.asarray(p.gb_rho, np.float32)
        sr_col = np.asarray(p.gb_sr, np.float32)
        const_arrays.update({
            "RHO": RHO, "TAU": TAU, "SUMJ": SUMJ, "TAUT": TAU.T.copy(),
            "lj_a_flat": flat(p.lj_a),
            "lj_b_flat": flat(p.lj_b),
            "qq_scaled_flat": flat(p.qq_scaled),
            "qq_full_flat": flat(p.qq_full),
            "eye_flat": flat(np.eye(n)),
            "gb_rho_flat_i": flat(np.broadcast_to(rho_col[:, None], (n, n))),
            "gb_sr_flat_j": flat(np.broadcast_to(sr_col[None, :], (n, n))),
        })
    use_neck = system.use_gb and p.neck_scale != 0.0 and p.neck_m0 is not None
    if use_neck:
        const_arrays["neck_d0"] = np.asarray(p.neck_d0, np.float32)[None]
        const_arrays["neck_m0"] = (
            float(p.neck_scale) * np.asarray(p.neck_m0, np.float32)
        )[None]
        if pack_pairs:
            n_ = system.n_atoms
            const_arrays["neck_d0_flat"] = np.asarray(
                p.neck_d0, np.float32
            ).reshape(1, n_ * n_)
            const_arrays["neck_m0_flat"] = (
                float(p.neck_scale) * np.asarray(p.neck_m0, np.float32)
            ).reshape(1, n_ * n_)
    static_consts = {
        "offsets": offsets,
        "gb_pref": float(p.gb_pref),
        "use_gb": system.use_gb,
        "use_neck": use_neck,
        "use_bias": bias_model is not None,
    }
    dynamic_names = []
    if bias_model is not None:
        if bias_quads is None:
            raise ValueError("bias_model requires bias_quads (dihedral atom quadruples)")
        if bias_kind not in ("harmonic", "metadynamics"):
            raise ValueError(f"bias_kind must be harmonic|metadynamics, got {bias_kind!r}")
        b_consts, b_statics, quads = _bias_consts(
            bias_model, bias_quads, bias_strength
        )
        const_arrays.update(b_consts)
        const_arrays["bias_S"] = _pack_selectors_for_quads(quads, system.n_atoms)
        static_consts.update(b_statics)
        static_consts["bias_kind"] = bias_kind
        if bias_kind == "metadynamics":
            if mtd_sigma is None:
                raise ValueError("metadynamics bias requires mtd_sigma (per-CV widths)")
            static_consts["mtd_inv_sigma_list"] = [
                float(v) for v in 1.0 / np.asarray(mtd_sigma, np.float64)
            ]
            # hills ledger arrays are RUNTIME inputs (they grow between
            # chunks without recompilation; capacity fixes the shapes).
            # Transposed layout: lanes = hills.
            if mtd_deposit_interval is not None:
                if n_steps % mtd_deposit_interval != 0:
                    raise ValueError(
                        "n_steps must be a multiple of mtd_deposit_interval"
                    )
                dynamic_names = ["mtd_centers_t", "mtd_heights", "mtd_count"]
            else:
                dynamic_names = ["mtd_centers_t", "mtd_heights", "mtd_mask"]
    fused_mtd = (
        bias_model is not None
        and bias_kind == "metadynamics"
        and mtd_deposit_interval is not None
    )
    const_names = list(const_arrays)
    c1 = math.exp(-friction * dt)
    c2sq = 1.0 - c1 * c1
    kB = BOLTZMANN_CONSTANT_KJ_PER_MOL
    Rtot, N = n_replicas, system.n_atoms

    # --- replica-block sizing (VMEM budget for the pair stage) ---------------
    # v5e VMEM is 128 MiB; XLA's default scoped limit is 16 MiB, so all
    # medium-N launches raise vmem_limit_bytes and budget against the
    # MEASURED footprint of the GB chain (N=138: 25.5 MiB at RB=2, 32.2 MiB
    # at RB=4 -> ~24 live padded (1, N, N) f32 temporaries per replica over
    # a ~19 MiB base; Mosaic keeps both GB sweeps' intermediates live).
    _VMEM_BYTES = 100 * 2**20
    if replica_block is None:
        if pack_pairs:
            # packed path: temporaries are (RB, N*N) lanes; ~40 live rows
            pad_p = -(-(N * N) // 128) * 128
            per_replica = 40 * pad_p * 4
            budget = int(0.8 * _VMEM_BYTES) - 20 * 2**20
            fit = max(int(budget // per_replica), 1)
            replica_block = max(
                d for d in range(1, Rtot + 1) if Rtot % d == 0 and d <= fit
            )
        else:
            pad_s = -(-N // 8) * 8
            pad_l = -(-N // 128) * 128
            per_replica = 24 * pad_s * pad_l * 4
            budget = int(0.8 * _VMEM_BYTES) - 20 * 2**20
            if per_replica > budget:
                raise ValueError(
                    f"N={N} exceeds the fused kernel's dense pair-stage VMEM "
                    f"budget even at replica_block=1 (needs ~{per_replica >> 20} "
                    "MiB); use the XLA path (use_pallas=False) for this system"
                )
            fit = int(budget // per_replica)
            replica_block = max(
                d for d in range(1, Rtot + 1) if Rtot % d == 0 and d <= fit
            )
    if Rtot % replica_block != 0:
        raise ValueError(
            f"replica_block {replica_block} must divide n_replicas {Rtot}"
        )
    R = int(replica_block)
    GRID = Rtot // R
    if GRID > 1 and fused_mtd:
        raise ValueError(
            "fully-fused metadynamics shares one hills ledger across all "
            "replicas; replica_block must equal n_replicas (grid steps would "
            "reorder deposits)"
        )

    def kernel(x_ref, v_ref, seed_ref, temp_ref, *rest):
        n_dyn = len(dynamic_names)
        dyn_refs = rest[:n_dyn]
        const_refs = rest[n_dyn : n_dyn + len(const_names)]
        out_refs = rest[n_dyn + len(const_names):]
        ox_ref, ov_ref, oe_ref = out_refs[:3]
        consts = {
            name: ref[...] for name, ref in zip(dynamic_names, dyn_refs)
        }
        consts.update(
            {name: ref[...] for name, ref in zip(const_names, const_refs)}
        )
        consts.update(static_consts)
        inv_m = consts["inv_m"]
        if GRID > 1:
            # per-grid-step seed offset keeps the blocks' noise independent
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            # blocked layout: state travels (RB, 3, N) — only the LEADING
            # (untiled) axis may carry a partial block on TPU; temps are
            # (RB, 1, 1) for the same reason
            kT = kB * temp_ref[...][:, 0, :]           # (R, 1)
        else:
            pltpu.prng_seed(seed_ref[0])
            kT = kB * temp_ref[...]                    # (R, 1)
        sigma_v = jnp.sqrt(c2sq * kT * inv_m)          # (R, N)

        forces_physical = _forces_planes_packed if pack_pairs else _forces_planes

        def forces(x0, x1, x2, consts):
            f0, f1, f2, e = forces_physical(x0, x1, x2, consts)
            if consts["use_bias"]:
                bf0, bf1, bf2, be = _bias_planes(x0, x1, x2, consts)
                f0, f1, f2 = f0 + bf0, f1 + bf1, f2 + bf2
                e = e + be
            return f0, f1, f2, e

        def make_step(consts_w):
            def step(_, carry):
                x0, x1, x2, v0, v1, v2 = carry
                f0, f1, f2, _ = forces(x0, x1, x2, consts_w)
                # Full-dt kick (folded BAOAB / OpenMM LangevinMiddle): the
                # trailing and next leading half-kicks share the same x, so
                # they merge into one dt kick. A half-dt kick here would
                # sample exp(-U/2kT) (configurational T doubled).
                half = 0.5 * dt
                v0 = v0 + dt * f0 * inv_m
                v1 = v1 + dt * f1 * inv_m
                v2 = v2 + dt * f2 * inv_m
                x0 = x0 + half * v0
                x1 = x1 + half * v1
                x2 = x2 + half * v2
                v0 = c1 * v0 + sigma_v * _normal_from_bits((R, N))
                v1 = c1 * v1 + sigma_v * _normal_from_bits((R, N))
                v2 = c1 * v2 + sigma_v * _normal_from_bits((R, N))
                x0 = x0 + half * v0
                x1 = x1 + half * v1
                x2 = x2 + half * v2
                return x0, x1, x2, v0, v1, v2
            return step

        if GRID > 1:
            xv = x_ref[...]                            # (R, 3, N)
            vv = v_ref[...]
            carry = (
                xv[:, 0, :], xv[:, 1, :], xv[:, 2, :],
                vv[:, 0, :], vv[:, 1, :], vv[:, 2, :],
            )
        else:
            carry = (
                x_ref[0], x_ref[1], x_ref[2],
                v_ref[0], v_ref[1], v_ref[2],
            )

        if not fused_mtd:
            x0, x1, x2, v0, v1, v2 = jax.lax.fori_loop(
                0, n_steps, make_step(consts), carry
            )
            _, _, _, energy = forces(x0, x1, x2, consts)
        else:
            # --- fully-fused metadynamics: deposits inside the launch -----
            # The hills ledger lives in VMEM SCRATCH refs and deposits are
            # predicated (@pl.when) — carrying the ledger through nested
            # fori loops made every MD step ~30x slower (loop-carried
            # vector captures defeat Mosaic's invariant hoisting).
            cT_ref, hts_ref, cnt_ref = out_refs[3:6]
            cT_ref[...] = consts["mtd_centers_t"]
            hts_ref[...] = consts["mtd_heights"]
            cnt_ref[...] = consts["mtd_count"]
            Hcap = consts["mtd_centers_t"].shape[1]
            n_cv = consts["mtd_centers_t"].shape[0]
            inv_sig = static_consts["mtd_inv_sigma_list"]
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Hcap), 1)
            kB_dT = (
                kB * (mtd_bias_factor - 1.0) * mtd_temperature_K
                if mtd_bias_factor is not None else None
            )

            def ledger_consts():
                cw = dict(consts)
                cw["mtd_centers_t"] = cT_ref[...]
                cw["mtd_heights"] = hts_ref[...]
                count = cnt_ref[0, 0].astype(jnp.int32)
                cw["mtd_mask"] = (lane_ids < count).astype(jnp.float32)
                return cw, count

            n_windows = n_steps // mtd_deposit_interval

            def window(w, scarry):
                # ledger loads hoisted ONCE per window: the inner MD loop
                # sees plain loop-invariant values (per-step ref loads or
                # loop-carried ledgers both collapsed throughput ~30x)
                cw, _ = ledger_consts()
                x0, x1, x2, v0, v1, v2 = jax.lax.fori_loop(
                    0, mtd_deposit_interval, make_step(cw), scarry
                )
                y = _cv_forward(x0, x1, x2, cw)           # (R, n_cv)
                for r in range(R):
                    cT = cT_ref[...]
                    hts = hts_ref[...]
                    count = cnt_ref[0, 0].astype(jnp.int32)
                    mask = (lane_ids < count).astype(jnp.float32)
                    d2 = None
                    for k in range(n_cv):
                        dk = (
                            y[r:r + 1, k:k + 1] - cT[k:k + 1, :]
                        ) * inv_sig[k]
                        d2 = dk * dk if d2 is None else d2 + dk * dk
                    if kB_dT is not None:
                        vh = jnp.sum(hts * mask * jnp.exp(-0.5 * d2))
                        h_new = mtd_height * jnp.exp(-vh / kB_dT)
                    else:
                        h_new = jnp.asarray(mtd_height, jnp.float32)
                    # one-hot lane write: the lane equal to `count` takes
                    # the new hill; a full ledger writes nowhere
                    write = (lane_ids == count).astype(jnp.float32)
                    cT_ref[...] = cT * (1.0 - write) + y[r:r + 1, :].T * write
                    hts_ref[...] = hts * (1.0 - write) + h_new * write
                    cnt_ref[...] = (
                        count.astype(jnp.float32) + jnp.sum(write)
                    ).reshape(1, 1)
                return x0, x1, x2, v0, v1, v2

            x0, x1, x2, v0, v1, v2 = jax.lax.fori_loop(
                0, n_windows, window, carry
            )
            cw, _ = ledger_consts()
            _, _, _, energy = forces(x0, x1, x2, cw)

        if GRID > 1:
            ox_ref[:, 0, :], ox_ref[:, 1, :], ox_ref[:, 2, :] = x0, x1, x2
            ov_ref[:, 0, :], ov_ref[:, 1, :], ov_ref[:, 2, :] = v0, v1, v2
            oe_ref[...] = energy[:, :, None]
        else:
            ox_ref[0], ox_ref[1], ox_ref[2] = x0, x1, x2
            ov_ref[0], ov_ref[1], ov_ref[2] = v0, v1, v2
            oe_ref[...] = energy

    const_values = [jnp.asarray(const_arrays[name]) for name in const_names]

    @jax.jit
    def chunk(x, v, seeds, temps, *dynamic_args):
        if len(dynamic_args) != len(dynamic_names):
            raise TypeError(
                f"chunk expects {len(dynamic_names)} extra args "
                f"({dynamic_names}), got {len(dynamic_args)}"
            )
        seed_scalar = jnp.sum(seeds.astype(jnp.int32))[None]
        dyn_vals = [jnp.asarray(a, jnp.float32) for a in dynamic_args]

        if GRID > 1:
            # Blocked layout: only the LEADING axis of a TPU block may be a
            # partial dimension (the last two must equal the array dims), so
            # state travels (Rtot, 3, N) sliced to (RB, 3, N) per grid step
            # and temps/energies travel (Rtot, 1, 1).
            xp = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)
            vp = jnp.transpose(v, (0, 2, 1)).astype(jnp.float32)

            def bcast(shape):
                nd = len(shape)
                return pl.BlockSpec(
                    shape, (lambda *_: (0,) * nd), memory_space=pltpu.VMEM
                )

            state_spec = pl.BlockSpec(
                (R, 3, N), (lambda i: (i, 0, 0)), memory_space=pltpu.VMEM
            )
            rung_spec = pl.BlockSpec(
                (R, 1, 1), (lambda i: (i, 0, 0)), memory_space=pltpu.VMEM
            )
            out = pl.pallas_call(
                kernel,
                grid=(GRID,),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_BYTES,
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((Rtot, 3, N), jnp.float32),
                    jax.ShapeDtypeStruct((Rtot, 3, N), jnp.float32),
                    jax.ShapeDtypeStruct((Rtot, 1, 1), jnp.float32),
                ),
                in_specs=[
                    state_spec, state_spec,
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    rung_spec,
                ]
                + [bcast(a.shape) for a in dyn_vals]
                + [bcast(c.shape) for c in const_values],
                out_specs=(state_spec, state_spec, rung_spec),
                interpret=interpret,
            )(
                xp, vp, seed_scalar,
                temps.astype(jnp.float32).reshape(Rtot, 1, 1),
                *dyn_vals,
                *const_values,
            )
            xo, vo, eo = out
            return (
                jnp.transpose(xo, (0, 2, 1)),
                jnp.transpose(vo, (0, 2, 1)),
                eo[:, 0, 0],
            )

        # single-block (legacy) layout: (3, R, N) planes, whole arrays
        xp = jnp.transpose(x, (2, 0, 1)).astype(jnp.float32)
        vp = jnp.transpose(v, (2, 0, 1)).astype(jnp.float32)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shapes = [
            jax.ShapeDtypeStruct((3, Rtot, N), jnp.float32),
            jax.ShapeDtypeStruct((3, Rtot, N), jnp.float32),
            jax.ShapeDtypeStruct((Rtot, 1), jnp.float32),
        ]
        if fused_mtd:
            centers_t = dynamic_args[0]
            out_shapes += [
                jax.ShapeDtypeStruct(centers_t.shape, jnp.float32),
                jax.ShapeDtypeStruct(dynamic_args[1].shape, jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ]
        out = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BYTES,
            ),
            in_specs=[
                vmem, vmem,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                vmem,
            ] + [vmem] * (len(dyn_vals) + len(const_values)),
            out_specs=tuple([vmem] * len(out_shapes)),
            interpret=interpret,
        )(
            xp, vp, seed_scalar,
            temps.astype(jnp.float32).reshape(Rtot, 1),
            *dyn_vals,
            *const_values,
        )
        xo, vo, eo = out[:3]
        result = (
            jnp.transpose(xo, (1, 2, 0)),
            jnp.transpose(vo, (1, 2, 0)),
            eo[:, 0],
        )
        if fused_mtd:
            result = result + tuple(out[3:])
        return result

    return chunk


def _parity_matrices(R: int):
    """Constant swap operators per parity: (partner one-hot P, paired flag,
    pair-min selector M_lo). Swapping becomes (R, R) matmuls."""
    out = []
    for p in (0, 1):
        P = np.zeros((R, R), np.float32)
        paired = np.zeros((R, 1), np.float32)
        Mlo = np.zeros((R, R), np.float32)
        for r in range(R):
            if r % 2 == p and r + 1 < R:
                q = r + 1
            elif r % 2 != p and r - 1 >= 0 and (r - 1) % 2 == p:
                q = r - 1
            else:
                q = r
            P[r, q] = 1.0
            paired[r, 0] = 1.0 if q != r else 0.0
            Mlo[r, min(r, q)] = 1.0
        out.append((P, paired, Mlo))
    return out


def _uniform_from_bits(shape) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    # mask to the low 23 bits: the raw int32 bits are signed, and a negative
    # uniform makes log() nan (silently rejecting half the swaps); Mosaic
    # cannot cast uint32->f32, so stay in non-negative int32 space
    bits = pltpu.prng_random_bits(shape) & 0x7FFFFF
    return bits.astype(jnp.float32) * (1.0 / 8388608.0) + 1e-7


def build_pallas_remd(
    system: System,
    ladder: np.ndarray,
    *,
    dt: float,
    friction: float,
    n_steps: int,
    exchange_frequency: int,
    report_interval: int,
    interpret: bool = False,
    bias_model=None,
    bias_quads: "np.ndarray | None" = None,
    bias_strength: float = 1.0,
):
    """Fully-fused REMD: MD + parity-alternating Metropolis swaps + frame
    capture, all inside ONE kernel launch.

    The swap is pure linear algebra: partner energies/temperatures gather
    through constant parity permutation one-hot matrices, pair-shared
    uniforms come from the pair-min selector, and accepted configurations
    move between rungs via T = (1-a) I + a P applied to every state plane
    (HIGHEST-precision matmuls). Returns
    ``remd(x, v, seed) -> (x, v, frames (F,3,R,N), frame_E (F,R),
    ids_hist (A+1,R), accept (A,R))``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ladder = np.asarray(ladder, np.float64)
    R = len(ladder)
    N = system.n_atoms
    if n_steps % exchange_frequency != 0:
        raise ValueError("n_steps must divide into exchange windows")
    if exchange_frequency % report_interval != 0:
        raise ValueError("report_interval must divide exchange_frequency")
    A = n_steps // exchange_frequency
    fpc = exchange_frequency // report_interval
    F = A * fpc
    frames_bytes = F * 3 * R * system.n_atoms * 4
    if frames_bytes > 8 * 1024 * 1024:
        raise ValueError(
            f"fused REMD frame buffer ({frames_bytes / 1e6:.1f} MB) exceeds "
            "the VMEM budget; lower n_steps per launch or raise "
            "report_interval (loop launches for longer runs)"
        )

    # reuse the chunk const assembly by building a throwaway chunk's tables
    # (cheap, host-side) — the kernels share every force constant
    p = make_dense_params(system)
    S_all, offsets = _pack_selectors(p)
    const_arrays = {
        "S_all": np.asarray(S_all, np.float32),
        "bond_k": np.asarray(p.bond_k, np.float32)[None, :],
        "bond_r0": np.asarray(p.bond_r0, np.float32)[None, :],
        "angle_k": np.asarray(p.angle_k, np.float32)[None, :],
        "angle_t0": np.asarray(p.angle_t0, np.float32)[None, :],
        "tor_k": np.asarray(p.tor_k, np.float32)[None, :],
        "tor_n": np.asarray(p.tor_n, np.float32)[None, :],
        "tor_nmask": _torsion_n_masks(np.asarray(p.tor_n)),
        "tor_sign": _torsion_signs(np.asarray(p.tor_phase))[None, :],
        "qq_full": np.asarray(p.qq_full, np.float32),
        "q": np.asarray(p.q, np.float32)[None, :],
        "gb_rho": np.asarray(p.gb_rho, np.float32)[None, :],
        "gb_sr": np.asarray(p.gb_sr, np.float32)[None, :],
        "gb_radii": np.asarray(p.gb_radii, np.float32)[None, :],
        "gb_alpha": np.asarray(p.gb_alpha, np.float32)[None, :],
        "gb_beta": np.asarray(p.gb_beta, np.float32)[None, :],
        "gb_gamma": np.asarray(p.gb_gamma, np.float32)[None, :],
        "sa_coef": np.asarray(p.sa_coef, np.float32)[None, :],
        "inv_m": (1.0 / np.asarray(p.masses, np.float32))[None, :],
    }
    n = N
    RHO, TAU, SUMJ = _pair_pack_matrices(n)
    flat = lambda m: np.asarray(m, np.float32).reshape(1, n * n)
    rho_col = np.asarray(p.gb_rho, np.float32)
    sr_col = np.asarray(p.gb_sr, np.float32)
    const_arrays.update({
        "RHO": RHO, "TAU": TAU, "SUMJ": SUMJ, "TAUT": TAU.T.copy(),
        "lj_a_flat": flat(p.lj_a),
        "lj_b_flat": flat(p.lj_b),
        "qq_scaled_flat": flat(p.qq_scaled),
        "qq_full_flat": flat(p.qq_full),
        "eye_flat": flat(np.eye(n)),
        "gb_rho_flat_i": flat(np.broadcast_to(rho_col[:, None], (n, n))),
        "gb_sr_flat_j": flat(np.broadcast_to(sr_col[None, :], (n, n))),
    })
    pack_pairs = True  # the fused-REMD kernel always packs pairs
    use_neck = system.use_gb and p.neck_scale != 0.0 and p.neck_m0 is not None
    if use_neck:
        const_arrays["neck_d0"] = np.asarray(p.neck_d0, np.float32)[None]
        const_arrays["neck_m0"] = (
            float(p.neck_scale) * np.asarray(p.neck_m0, np.float32)
        )[None]
        if pack_pairs:
            n_ = system.n_atoms
            const_arrays["neck_d0_flat"] = np.asarray(
                p.neck_d0, np.float32
            ).reshape(1, n_ * n_)
            const_arrays["neck_m0_flat"] = (
                float(p.neck_scale) * np.asarray(p.neck_m0, np.float32)
            ).reshape(1, n_ * n_)
    static_consts = {
        "offsets": offsets,
        "gb_pref": float(p.gb_pref),
        "use_gb": system.use_gb,
        "use_neck": use_neck,
        "use_bias": bias_model is not None,
        "skip_pairs": False,
    }
    if bias_model is not None:
        b_consts, b_statics, quads = _bias_consts(
            bias_model, bias_quads, bias_strength
        )
        const_arrays.update(b_consts)
        const_arrays["bias_S"] = _pack_selectors_for_quads(quads, N)
        static_consts.update(b_statics)
        static_consts["bias_kind"] = "harmonic"

    # swap constants
    (P0, paired0, Mlo0), (P1, paired1, Mlo1) = _parity_matrices(R)
    betas = (1.0 / (BOLTZMANN_CONSTANT_KJ_PER_MOL * ladder)).astype(np.float32)
    const_arrays.update({
        "P0": P0, "P1": P1,
        "paired0": paired0, "paired1": paired1,
        "Mlo0": Mlo0, "Mlo1": Mlo1,
        "betas": betas[:, None],
        "ladder": ladder.astype(np.float32)[:, None],
        "ids0": np.arange(R, dtype=np.float32)[:, None],
    })
    const_names = list(const_arrays)
    c1 = math.exp(-friction * dt)
    c2sq = 1.0 - c1 * c1
    kB = BOLTZMANN_CONSTANT_KJ_PER_MOL

    def _hp_dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def kernel(x_ref, v_ref, seed_ref, *rest):
        const_refs = rest[: len(const_names)]
        (ox_ref, ov_ref, frames_ref, fe_ref, ids_ref, acc_ref) = rest[
            len(const_names):
        ]
        consts = {
            name: ref[...] for name, ref in zip(const_names, const_refs)
        }
        consts.update(static_consts)
        inv_m = consts["inv_m"]
        pltpu.prng_seed(seed_ref[0])
        kT = kB * consts["ladder"]                      # (R, 1)
        sigma_v = jnp.sqrt(c2sq * kT * inv_m)

        def forces(x0, x1, x2):
            f0, f1, f2, e = _forces_planes_packed(x0, x1, x2, consts)
            if consts["use_bias"]:
                bf0, bf1, bf2, be = _bias_planes(x0, x1, x2, consts)
                f0, f1, f2 = f0 + bf0, f1 + bf1, f2 + bf2
                e = e + be
            return f0, f1, f2, e

        def step(_, carry):
            x0, x1, x2, v0, v1, v2 = carry
            f0, f1, f2, _ = forces(x0, x1, x2)
            # Full-dt kick (folded BAOAB) — see make_step() in
            # build_pallas_chunk and md/integrate.py langevin_step.
            half = 0.5 * dt
            v0 = v0 + dt * f0 * inv_m
            v1 = v1 + dt * f1 * inv_m
            v2 = v2 + dt * f2 * inv_m
            x0 = x0 + half * v0
            x1 = x1 + half * v1
            x2 = x2 + half * v2
            v0 = c1 * v0 + sigma_v * _normal_from_bits((R, N))
            v1 = c1 * v1 + sigma_v * _normal_from_bits((R, N))
            v2 = c1 * v2 + sigma_v * _normal_from_bits((R, N))
            x0 = x0 + half * v0
            x1 = x1 + half * v1
            x2 = x2 + half * v2
            return x0, x1, x2, v0, v1, v2

        ids_ref[pl.ds(0, 1)] = consts["ids0"].T

        def attempt(a, carry):
            x0, x1, x2, v0, v1, v2, ids = carry

            def frame_loop(j, fcarry):
                x0, x1, x2, v0, v1, v2, last_e = fcarry
                x0, x1, x2, v0, v1, v2 = jax.lax.fori_loop(
                    0, report_interval, step, (x0, x1, x2, v0, v1, v2)
                )
                _, _, _, e = forces(x0, x1, x2)
                f = a * fpc + j
                frames_ref[pl.ds(f, 1)] = jnp.stack([x0, x1, x2])[None]
                fe_ref[pl.ds(f, 1)] = e.T
                return x0, x1, x2, v0, v1, v2, e

            x0, x1, x2, v0, v1, v2, energy = jax.lax.fori_loop(
                0, fpc, frame_loop,
                (x0, x1, x2, v0, v1, v2, jnp.zeros((R, 1), jnp.float32)),
            )
            # --- swap (constant parity operators) -------------------------
            even = (a % 2) == 0
            P = jnp.where(even, consts["P0"], consts["P1"])
            paired = jnp.where(even, consts["paired0"], consts["paired1"])
            Mlo = jnp.where(even, consts["Mlo0"], consts["Mlo1"])
            E_part = _hp_dot(P, energy)
            beta = consts["betas"]
            beta_part = _hp_dot(P, beta)
            log_acc = (beta - beta_part) * (energy - E_part)
            u = _uniform_from_bits((R, 1))
            u_lo = _hp_dot(Mlo, u)
            accept = (
                (jnp.log(u_lo) < log_acc).astype(jnp.float32) * paired
            )                                            # (R, 1)
            T = consts["eye_R"] * (1.0 - accept) + P * accept
            temps_new = _hp_dot(T, consts["ladder"])
            scale = jnp.sqrt(consts["ladder"] / temps_new)
            x0 = _hp_dot(T, x0)
            x1 = _hp_dot(T, x1)
            x2 = _hp_dot(T, x2)
            v0 = _hp_dot(T, v0) * scale
            v1 = _hp_dot(T, v1) * scale
            v2 = _hp_dot(T, v2) * scale
            ids = _hp_dot(T, ids)
            ids_ref[pl.ds(a + 1, 1)] = ids.T
            acc_ref[pl.ds(a, 1)] = accept.T
            return x0, x1, x2, v0, v1, v2, ids

        carry = (
            x_ref[0], x_ref[1], x_ref[2],
            v_ref[0], v_ref[1], v_ref[2],
            consts["ids0"],
        )
        x0, x1, x2, v0, v1, v2, ids = jax.lax.fori_loop(0, A, attempt, carry)
        ox_ref[0], ox_ref[1], ox_ref[2] = x0, x1, x2
        ov_ref[0], ov_ref[1], ov_ref[2] = v0, v1, v2

    const_arrays["eye_R"] = np.eye(R, dtype=np.float32)
    const_names = list(const_arrays)
    const_values = [jnp.asarray(const_arrays[name]) for name in const_names]

    @jax.jit
    def remd(x, v, seed):
        xp = jnp.transpose(x, (2, 0, 1)).astype(jnp.float32)
        vp = jnp.transpose(v, (2, 0, 1)).astype(jnp.float32)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((3, R, N), jnp.float32),
                jax.ShapeDtypeStruct((3, R, N), jnp.float32),
                jax.ShapeDtypeStruct((F, 3, R, N), jnp.float32),
                jax.ShapeDtypeStruct((F, R), jnp.float32),
                jax.ShapeDtypeStruct((A + 1, R), jnp.float32),
                jax.ShapeDtypeStruct((A, R), jnp.float32),
            ),
            in_specs=[
                vmem, vmem,
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [vmem] * len(const_values),
            out_specs=tuple([vmem] * 6),
            interpret=interpret,
        )(
            xp, vp, jnp.asarray(seed, jnp.int32).reshape(1),
            *const_values,
        )
        xo, vo, frames, fe, ids, acc = out
        return (
            jnp.transpose(xo, (1, 2, 0)),
            jnp.transpose(vo, (1, 2, 0)),
            jnp.transpose(frames, (0, 2, 3, 1)),   # (F, R, N, 3)
            fe,
            ids,
            acc,
        )

    return remd


__all__ = ["build_pallas_chunk", "build_pallas_remd"]
