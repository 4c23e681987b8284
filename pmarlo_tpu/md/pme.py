"""Smooth particle-mesh Ewald electrostatics for the periodic path.

The round-2 explicit-solvent path used reaction-field Coulomb only
(md/pallas_periodic.py) — a documented approximation. This module adds
full Ewald electrostatics the TPU-native way (VERDICT r2 next-round
item #3; reference anchor: the OpenMM System built for solvated prep
defaults to PME, /root/reference/src/pmarlo/protein/protein.py:733):

* real space: ke * q_i q_j * erfc(alpha r)/r inside the cutoff —
  computed by the cell-list kernel in its "ewald" electrostatics mode
  (md/pallas_cells.py) or by the dense XLA reference here;
* reciprocal space: SMOOTH PME (Essmann et al. 1995) — 4th-order
  cardinal-B-spline charge spreading onto a (K1, K2, K3) grid,
  ``jnp.fft.fftn`` (the MXU-adjacent FFT path XLA optimizes well),
  influence function exp(-pi^2 m^2/alpha^2)/m^2 with B-spline
  deconvolution |b1 b2 b3|^2;
* self energy, net-charge background, and sparse excluded-pair
  corrections (subtract erf(alpha r)/r for pairs the reciprocal sum
  should not count — bounded as r -> 0, so no cancellation hazard).

Forces come from ``jax.grad`` of the reciprocal energy: charge
spreading and the FFT are differentiable, so the classic
interpolate-the-field force pass is simply autodiff — the same
architectural collapse the framework applies to CV biasing
(SURVEY.md section 7 design stance).

Validation: tests/unit/test_pme.py — Madelung constant of the NaCl
rocksalt lattice to 4 decimal places, dense-reference parity, and the
measured RF-vs-PME delta on a TIP3P box.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 as KE

SPLINE_ORDER = 4
#: default real-space mesh spacing per spline order (nm). Order 6 rides
#: a ~1.3x coarser mesh at matched accuracy (PME reciprocal error falls
#: steeply with order), cutting the spreading-matmul flops ~2.4x.
SPACING_BY_ORDER = {4: 0.11, 6: 0.145}
#: calibration constant h * alpha per order: the reciprocal error is a
#: function of alpha*h (largest mesh frequency in units of alpha), so a
#: sharper alpha needs a proportionally finer mesh. Calibrated at
#: alpha = 2.9203 (rc 0.9 nm, tol 5e-4) where the SPACING_BY_ORDER
#: values were validated against a tight reference.
_MESH_CALIBRATION = {o: h * 2.9202898720871846
                     for o, h in SPACING_BY_ORDER.items()}


def pme_spacing(order: int, alpha: float) -> float:
    """Mesh spacing (nm) holding reciprocal accuracy constant as alpha
    varies: h = (h_cal * alpha_cal) / alpha."""
    return _MESH_CALIBRATION[order] / alpha


def ewald_alpha(cutoff: float, tolerance: float = 5e-4) -> float:
    """OpenMM's alpha choice: erfc(alpha rc)/rc ~ tolerance
    (NonbondedForce ewaldErrorTolerance semantics)."""
    return math.sqrt(-math.log(2.0 * tolerance)) / cutoff


def pme_grid_shape(
    box: Tuple[float, float, float], spacing: float = 0.11
) -> Tuple[int, int, int]:
    """Mesh dims: ~``spacing`` nm, rounded up to a multiple of 8
    (FFT-friendly and sublane-aligned)."""
    def dim(L):
        k = int(np.ceil(L / spacing))
        return max(((k + 7) // 8) * 8, 16)

    return tuple(dim(float(L)) for L in box)


def _mn_integer(order: int) -> np.ndarray:
    """Cardinal B-spline M_n at the integers 1..n-1 (host-side, by the
    stable Cox-de Boor recursion M_n(u) = u/(n-1) M_{n-1}(u)
    + (n-u)/(n-1) M_{n-1}(u-1), M_2 = triangle)."""
    u = np.arange(1, order, dtype=np.float64)
    M = np.maximum(1.0 - np.abs(u - 1.0), 0.0)          # M_2(u)
    for n in range(3, order + 1):
        M = (u * M + (n - u) * np.concatenate([[0.0], M[:-1]])) / (n - 1)
        # note: M_{n-1}(u-1) shifts the samples right by one integer
    return M


def _bspline_weights(t: jax.Array, order: int) -> jax.Array:
    """Cardinal B-spline M_order weights for fractional offset t in
    [0,1): returns (..., order) weights for the ``order`` grid points
    floor(u) - order//2 + 1 .. floor(u) + order//2, via the same
    Cox-de Boor recursion evaluated at u = t + (order-1-k)."""
    if order == 4:
        # closed form: cheapest and exactly the classic smooth-PME M4
        w0 = (1.0 - t) ** 3 / 6.0
        w1 = (3.0 * t**3 - 6.0 * t**2 + 4.0) / 6.0
        w2 = (-3.0 * t**3 + 3.0 * t**2 + 3.0 * t + 1.0) / 6.0
        w3 = t**3 / 6.0
        return jnp.stack([w0, w1, w2, w3], axis=-1)
    # general order: evaluate M_order(t + j) on the ASCENDING sample
    # vector u_k = t + k (so u_k - 1 = u_{k-1} and the recursion's
    # M_{n-1}(u-1) term is a right-shift), then flip to the w[j] =
    # M_order(t + order-1-j) layout the order-4 closed form uses
    offs = jnp.arange(order, dtype=t.dtype)
    u = t[..., None] + offs                               # (..., order)
    M = jnp.maximum(1.0 - jnp.abs(u - 1.0), 0.0)          # M_2
    for n in range(3, order + 1):
        M_shift = jnp.concatenate(
            [jnp.zeros_like(M[..., :1]), M[..., :-1]], axis=-1
        )
        M = (u * M + (n - u) * M_shift) / (n - 1)
    return jnp.flip(M, axis=-1)


def _bspline_bsq(K: int, order: int = SPLINE_ORDER) -> np.ndarray:
    """|b(m)|^2 deconvolution factors for order-n splines on a K grid
    (Essmann eq. 4.4): b(m) = e^{2 pi i (n-1) m/K}
    / sum_k M_n(k+1) e^{2 pi i m k/K}."""
    m = np.arange(K)
    M = _mn_integer(order)
    denom = np.zeros(K, dtype=np.complex128)
    for k in range(order - 1):
        denom += M[k] * np.exp(2j * np.pi * m * k / K)
    bsq = 1.0 / np.maximum(np.abs(denom) ** 2, 1e-14)
    # odd-K edge modes where the denominator vanishes are dropped by the
    # influence function anyway; clamp for safety
    return bsq


def _dense_axis_weights(u: jax.Array, K: int,
                        order: int = SPLINE_ORDER) -> jax.Array:
    """(N, K) per-axis spline weight matrix: ``order`` nonzero columns
    per atom built by one-hot comparison instead of scatter (TPU
    scatters of order^3 N mesh points dominated the round-3 PME profile
    at ~35 ms; this formulation turns spreading into batched MXU
    matmuls)."""
    u0 = jnp.floor(u)
    t = u - u0
    w = _bspline_weights(t, order)                       # (N, order)
    return _axis_weight_matrix(w, u0.astype(jnp.int32), K)


def _bspline_weights_df(t_hi: jax.Array, t_lo: jax.Array, order: int):
    """Cardinal B-spline weights carried in df32 (hi, lo) precision.

    The f32 Cox-de Boor recursion rounds to ~2 ulp per weight, which was
    measured to be the dominant PME reciprocal force-noise source after
    the fractional coordinate is computed exactly (ROUND4 notes).
    Running the same recursion in double-float arithmetic (md/eft.py)
    drops the weight error to ~1e-10 using only native f32 ops. Returns
    ((..., order) hi, (..., order) lo) in the same flipped layout as
    :func:`_bspline_weights`."""
    from .eft import (
        df_abs, df_add, df_const, df_max0, df_mul, df_scale, df_sub,
    )

    offs = np.arange(order, dtype=np.float32)
    # u_k = t + k as df32 (t_hi + k rounds past 24 bits, so two_sum it)
    u = df_add((t_hi[..., None] + jnp.zeros_like(offs),
                t_lo[..., None] + jnp.zeros_like(offs)),
               (jnp.broadcast_to(offs, t_hi.shape + (order,)),
                jnp.zeros(t_hi.shape + (order,), t_hi.dtype)))
    one = (jnp.ones_like(u[0]), jnp.zeros_like(u[0]))
    M = df_max0(df_sub(one, df_abs(df_sub(u, one))))        # M_2(u)
    for n in range(3, order + 1):
        M_shift = (
            jnp.concatenate([jnp.zeros_like(M[0][..., :1]),
                             M[0][..., :-1]], axis=-1),
            jnp.concatenate([jnp.zeros_like(M[1][..., :1]),
                             M[1][..., :-1]], axis=-1),
        )
        n_df = (jnp.full_like(u[0], float(n)), jnp.zeros_like(u[0]))
        term = df_add(df_mul(u, M), df_mul(df_sub(n_df, u), M_shift))
        rh, rl = df_const(1.0 / (n - 1))
        M = df_scale(term, rh, rl)
    return jnp.flip(M[0], axis=-1), jnp.flip(M[1], axis=-1)


def _S_df_traced(box: jax.Array, ratios, shape: Tuple[int, int, int]):
    """(Sh, Sl) split of S = Hinv @ diag(K) for a TRACED (3,) box
    diagonal + static tilt ratios (the NPT path: md/box.py
    traced_matrices convention, u = x @ Hinv with lower-triangular
    Hinv). Only 1/L_i needs df precision (df_inv); the static ratio
    coefficients fold in exactly via df_scale."""
    from .eft import df_const, df_inv, df_scale

    r1, r2, r3 = (float(r) for r in ratios)
    K1, K2, K3 = (float(k) for k in shape)
    ia = df_inv(box[0])
    ib = df_inv(box[1])
    ic = df_inv(box[2])
    z = jnp.zeros_like(box[0])

    def ent(inv, coef):
        h, lo = df_scale(inv, *df_const(coef))
        return h, lo

    # nonzero S entries (see traced_matrices' Hinv): S[i,j] = Hinv[i,j]K_j
    e00 = ent(ia, K1)
    e10 = ent(ib, -r1 * K1)
    e11 = ent(ib, K2)
    e20 = ent(ic, (r1 * r3 - r2) * K1)
    e21 = ent(ic, -r3 * K2)
    e22 = ent(ic, K3)

    def mat(k):
        return jnp.stack([
            jnp.stack([e00[k], z, z]),
            jnp.stack([e10[k], e11[k], z]),
            jnp.stack([e20[k], e21[k], e22[k]]),
        ])

    return mat(0), mat(1)


def _frac_coords_df(x: jax.Array, S=None, Sh=None, Sl=None):
    """u = x @ S computed in df32.

    Either ``S`` (host float64, S = Hinv @ diag(K) — static boxes) or a
    pre-split traced pair (``Sh``, ``Sl``) from :func:`_S_df_traced`
    (NPT traced boxes). Returns (u0 int32 floor, t_hi, t_lo) per axis,
    with the fractional part accurate to ~f32 eps ABSOLUTE — the naive
    f32 path loses log2(K) mantissa bits to the floor subtraction
    (t error ~K*eps), which seeds the spreading-weight noise."""
    from .eft import df_add, fast_two_sum, two_prod, two_sum

    if S is not None:
        Sh = np.float32(S)
        Sl = np.float32(S - np.float64(Sh))
    uh = jnp.zeros_like(x)
    ul = jnp.zeros_like(x)
    for j in range(3):
        ph, pe = two_prod(x[:, j:j + 1], Sh[j][None, :])
        pe = pe + x[:, j:j + 1] * Sl[j][None, :]
        uh, ul = df_add((uh, ul), fast_two_sum(ph, pe))
    u0 = jnp.floor(uh)
    th, tl = two_sum(uh - u0, ul)   # uh - u0 exact (integer subtraction)
    # renormalize the rare boundary spill into [0, 1)
    under = th < 0
    over = th >= 1.0
    u0 = u0 + jnp.where(over, 1.0, 0.0) - jnp.where(under, 1.0, 0.0)
    th = th + jnp.where(under, 1.0, 0.0) - jnp.where(over, 1.0, 0.0)
    return u0.astype(jnp.int32), th, tl


#: all PME spreading matmuls run at HIGHEST precision. TPU matmul units
#: default to bf16 inputs (8 mantissa bits): measured ON CHIP, default
#: precision put 2.15 kJ/mol/nm of noise on the reciprocal forces (vs
#: 4.4e-4 for the same f32 program on CPU) — THE round-4 PME NVE drift
#: floor, invisible to every CPU-backend noise measurement. HIGHEST
#: (f32 via multi-pass) restores the CPU noise floor at a cost that is
#: negligible next to the FFT.
_PME_PREC = jax.lax.Precision.HIGHEST


def _axis_weight_matrix(w: jax.Array, u0: jax.Array, K: int) -> jax.Array:
    """(N, K) weight matrix from (N, order) weights by one-hot selection
    (exact — the ``order`` wrapped columns are distinct for K > order)."""
    order = w.shape[-1]
    offs = jnp.arange(order, dtype=jnp.int32)
    cols = (u0[:, None] - 1 + offs[None, :]) % K
    k = jnp.arange(K, dtype=jnp.int32)
    onehot = (cols[:, :, None] == k[None, None, :]).astype(w.dtype)
    return jnp.einsum("no,nok->nk", w, onehot, precision=_PME_PREC)


def _spread_from_W(Wx: jax.Array, Wy: jax.Array, Wzq: jax.Array) -> jax.Array:
    def plane(wz_k):
        return jnp.matmul((Wx * wz_k[:, None]).T, Wy, precision=_PME_PREC)
    return jax.vmap(plane, in_axes=1, out_axes=2)(Wzq)


def spread_charges_precise(
    x: jax.Array, q: jax.Array,
    box: "Tuple[float, float, float] | jax.Array",
    shape: Tuple[int, int, int],
    order: int = SPLINE_ORDER,
    tilt: Optional[Tuple[float, float, float]] = None,
    tilt_ratios: Optional[Tuple[float, float, float]] = None,
) -> jax.Array:
    """Compensated-precision charge spreading (VERDICT r3 item 2).

    The fractional coordinates and spline weights are computed in df32
    (md/eft.py): the naive path loses log2(K) mantissa bits in
    ``t = u - floor(u)`` and ~2 ulp in the f32 Cox-de Boor recursion,
    which was measured (ROUND4 notes) to be the dominant PME reciprocal
    force-noise source — the non-conservative noise behind the round-3
    NVE drift floor. The df recursion's normalized hi limb is the
    CORRECTLY ROUNDED f32 weight, so a single plain-f32 matmul over the
    hi limbs already sits at the matmul noise floor; carrying the lo
    limbs through three extra cross-term matmuls was measured to buy
    nothing further (backward-pass noise dominates the residual).
    Measured on the lattice-water oracle: reciprocal force error
    5.0e-4 -> 1.8e-4 kJ/mol/nm (2.9x), at pure-elementwise extra cost —
    the matmuls, FFT, influence, and real-space stages are untouched.

    TRACED boxes (NPT — ``box`` a (3,) array, tilt via static
    ``tilt_ratios``) build the df32 split of S = Hinv diag(K) on device
    (:func:`_S_df_traced`): the round-5 extension that lets the precise
    path cover the production NPT protocol (VERDICT r4 item 3)."""
    K1, K2, K3 = shape
    if isinstance(box, jax.Array) or tilt_ratios is not None:
        Sh, Sl = _S_df_traced(
            jnp.asarray(box, jnp.float32),
            tilt_ratios or (0.0, 0.0, 0.0), shape,
        )
        u0, th, tl = _frac_coords_df(x, Sh=Sh, Sl=Sl)
    else:
        if tilt is None:
            H = np.diag(np.asarray(box, np.float64))
        else:
            from .box import box_matrix

            H = np.asarray(box_matrix(box, tilt), np.float64)
        S = np.linalg.inv(H) @ np.diag(
            np.asarray([K1, K2, K3], np.float64))
        u0, th, tl = _frac_coords_df(x, S)
    W = []
    for a, K in enumerate((K1, K2, K3)):
        wh, _ = _bspline_weights_df(th[:, a], tl[:, a], order)
        W.append(_axis_weight_matrix(wh, u0[:, a], K))
    return _spread_from_W(W[0], W[1], W[2] * q[:, None])


def spread_charges(
    x: jax.Array, q: jax.Array,
    box: Tuple[float, float, float],
    shape: Tuple[int, int, int],
    order: int = SPLINE_ORDER,
    tilt: Optional[Tuple[float, float, float]] = None,
    tilt_ratios: Optional[Tuple[float, float, float]] = None,
) -> jax.Array:
    """Charge spreading with M_order spline weights as separable
    matmuls: Q[i, j, k] = sum_n (q_n Wz[n, k]) Wx[n, i] Wy[n, j] — one
    (K1, N) x (N, K2) matmul per z-plane, batched. MXU-native and
    differentiable in ``x`` (the force pass is just autodiff).

    ``tilt``: triclinic off-diagonals (md/box.py) for a STATIC box. The
    mesh lives in FRACTIONAL coordinates, so triclinic spreading is
    just a different ``u`` map (u = (x @ Hinv) * K); the ``% K`` column
    wrap already handles out-of-cell positions on both paths.
    ``tilt_ratios`` (bx/ax, cx/ax, cy/by): the TRACED-box triclinic
    form (NPT — isotropic moves keep the ratios static)."""
    K1, K2, K3 = shape
    Ks = jnp.asarray([K1, K2, K3], x.dtype)
    if tilt_ratios is not None:
        from .box import traced_matrices

        _, Hinv = traced_matrices(
            jnp.asarray(box, x.dtype), tilt_ratios
        )
        u = jnp.matmul(x, Hinv, precision=_PME_PREC) * Ks
    elif tilt is None:
        L = jnp.asarray(box, x.dtype)
        u = x / L * Ks
    else:
        from .box import box_matrix

        Hinv = np.linalg.inv(box_matrix(box, tilt))
        u = jnp.matmul(x, jnp.asarray(Hinv, x.dtype),
                       precision=_PME_PREC) * Ks
    Wx = _dense_axis_weights(u[:, 0], K1, order)         # (N, K1)
    Wy = _dense_axis_weights(u[:, 1], K2, order)
    Wz = _dense_axis_weights(u[:, 2], K3, order) * q[:, None]
    return _spread_from_W(Wx, Wy, Wz)                    # (K1, K2, K3)


def reciprocal_energy(
    x: jax.Array, q: jax.Array,
    box: Tuple[float, float, float],
    alpha: float,
    shape: Tuple[int, int, int],
    order: int = SPLINE_ORDER,
    tilt: Optional[Tuple[float, float, float]] = None,
    tilt_ratios: Optional[Tuple[float, float, float]] = None,
    precise: bool = False,
) -> jax.Array:
    """Smooth-PME reciprocal-space energy (Essmann eq. 4.7):
    E = ke/(2 pi V) * sum_{m != 0} exp(-pi^2 m^2/alpha^2)/m^2 B(m) |F[Q](m)|^2.

    ``box`` may be a traced (3,) array (the NPT path, where Monte-Carlo
    volume moves change the box inside one compiled program): the
    influence function is then built on device; the B-spline
    deconvolution factors stay static (they depend only on K and
    order)."""
    K1, K2, K3 = shape
    if tilt is not None and isinstance(box, jax.Array):
        # must precede spread_charges: its tilt branch calls
        # box_matrix(box, tilt), whose float() on traced entries would
        # die with an opaque ConcretizationTypeError instead. The
        # traced-box triclinic form is ``tilt_ratios`` (NPT path).
        raise NotImplementedError(
            "traced-box reciprocal energy takes tilt_ratios, not a "
            "static tilt (md/box.py tilt_ratios)"
        )
    if precise:
        # df32 spreading (VERDICT r3 item 2): kills the f32
        # fractional-coordinate/weight force noise. Traced boxes (NPT)
        # supported since round 5 via the on-device df split of S.
        Q = spread_charges_precise(x, q, box, shape, order, tilt=tilt,
                                   tilt_ratios=tilt_ratios)
    else:
        Q = spread_charges(x, q, box, shape, order, tilt=tilt,
                           tilt_ratios=tilt_ratios)
    F = jnp.fft.fftn(Q)
    B = (_bspline_bsq(K1, order)[:, None, None]
         * _bspline_bsq(K2, order)[None, :, None]
         * _bspline_bsq(K3, order)[None, None, :])
    # ONE influence-function pipeline, two homes: the reciprocal
    # wavevector is always m~ = Hinv @ m (lower-triangular Hinv, so the
    # three components broadcast cheaply; orthorhombic cells are just
    # zero ratios). A traced box (NPT) builds it on DEVICE via
    # traced_matrices; a static box precomputes the whole influence
    # array in float64 numpy and folds it into the program as a
    # constant.
    if isinstance(box, jax.Array) or tilt_ratios is not None:
        from .box import traced_matrices

        box_j = jnp.asarray(box, jnp.float32)
        _, Hi = traced_matrices(box_j, tilt_ratios or (0.0, 0.0, 0.0))

        def ifreqs(K):
            return jnp.asarray(np.fft.fftfreq(K) * K, jnp.float32)

        m1 = ifreqs(K1)[:, None, None]
        m2 = ifreqs(K2)[None, :, None]
        m3 = ifreqs(K3)[None, None, :]
        mx = Hi[0, 0] * m1
        my = Hi[1, 0] * m1 + Hi[1, 1] * m2
        mz = Hi[2, 0] * m1 + Hi[2, 1] * m2 + Hi[2, 2] * m3
        msq = mx * mx + my * my + mz * mz
        infl = jnp.where(
            msq > 0.0,
            jnp.exp(-np.pi**2 * msq / alpha**2)
            / jnp.where(msq > 0.0, msq, 1.0)
            * jnp.asarray(B, jnp.float32),
            0.0,
        )
        V = box_j[0] * box_j[1] * box_j[2]
        return (KE / (2.0 * np.pi * V)) * jnp.sum(infl * jnp.abs(F) ** 2)

    from .box import box_matrix

    Hi = np.linalg.inv(box_matrix(box, tilt))
    m1 = (np.fft.fftfreq(K1) * K1)[:, None, None]
    m2 = (np.fft.fftfreq(K2) * K2)[None, :, None]
    m3 = (np.fft.fftfreq(K3) * K3)[None, None, :]
    mx = Hi[0, 0] * m1
    my = Hi[1, 0] * m1 + Hi[1, 1] * m2
    mz = Hi[2, 0] * m1 + Hi[2, 1] * m2 + Hi[2, 2] * m3
    msq = mx * mx + my * my + mz * mz
    with np.errstate(divide="ignore", invalid="ignore"):
        infl = np.exp(-np.pi**2 * msq / alpha**2) / msq * B
    infl[0, 0, 0] = 0.0
    infl = jnp.asarray(infl.astype(np.float32))
    V = float(box[0]) * float(box[1]) * float(box[2])
    return (KE / (2.0 * np.pi * V)) * jnp.sum(infl * jnp.abs(F) ** 2)


def self_energy(q: jax.Array, alpha: float) -> jax.Array:
    return -KE * alpha / math.sqrt(math.pi) * jnp.sum(q * q)


def background_energy(q: jax.Array, box, alpha: float) -> jax.Array:
    """Neutralizing-background term for net-charge cells. ``box`` may be
    a traced (3,) array (NPT: the term is volume-dependent)."""
    if isinstance(box, jax.Array):
        V = box[0] * box[1] * box[2]
    else:
        V = float(box[0]) * float(box[1]) * float(box[2])
    return -KE * math.pi / (2.0 * alpha**2 * V) * jnp.sum(q) ** 2


def real_space_energy_dense(
    x: jax.Array, q: jax.Array,
    box: Tuple[float, float, float],
    cutoff: float, alpha: float,
    exclude_mask: Optional[jax.Array] = None,
    tilt: Optional[Tuple[float, float, float]] = None,
) -> jax.Array:
    """Dense XLA reference for the Ewald real-space sum (min-image,
    erfc(alpha r)/r inside rc). ``exclude_mask`` (N, N) of 1s for pairs
    to SKIP (still counted by the reciprocal sum; callers correct).
    Triclinic cells use the rounded fractional minimum image — exact
    for every r < cutoff when the cell's perpendicular widths exceed
    2*cutoff (asserted here; beyond-cutoff pairs are masked regardless
    of which image the rounding picks). min_image_exact would build an
    (N, N, 27, 3) candidate array — 27x the memory of this path."""
    d = x[:, None, :] - x[None, :, :]
    if tilt is None:
        L = jnp.asarray(box, x.dtype)
        d = d - L * jnp.round(d / L)
    else:
        from .box import box_matrix, min_image_round, perp_widths

        H = box_matrix(box, tilt)
        if float(np.min(perp_widths(H))) <= 2.0 * float(cutoff):
            raise ValueError(
                "triclinic dense real-space sum needs min perpendicular "
                f"width > 2*cutoff; box {tuple(box)} tilt {tuple(tilt)} "
                f"vs cutoff {cutoff}"
            )
        d = min_image_round(d, jnp.asarray(H, x.dtype),
                            jnp.asarray(np.linalg.inv(H), x.dtype))
    r2 = jnp.sum(d * d, axis=-1)
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    r = jnp.sqrt(jnp.where(r2 > 1e-12, r2, 1.0))
    within = (r < cutoff).astype(x.dtype) * (1.0 - eye)
    if exclude_mask is not None:
        within = within * (1.0 - exclude_mask)
    e = KE * q[:, None] * q[None, :] * jax.lax.erfc(alpha * r) / r
    return 0.5 * jnp.sum(e * within)


def excluded_pair_correction(
    x: jax.Array, q: jax.Array,
    box: Tuple[float, float, float],
    alpha: float,
    e_i: jax.Array, e_j: jax.Array, se: jax.Array,
    tilt: Optional[Tuple[float, float, float]] = None,
) -> jax.Array:
    """For pairs with electrostatic scale se < 1 the reciprocal sum
    counted a full erf(alpha r)/r interaction that the force field does
    not want: subtract it and add the scaled bare-Coulomb part for 1-4
    pairs. erf(alpha r)/r -> 2 alpha/sqrt(pi) as r -> 0: bounded, so
    this sparse subtraction has none of the LJ r^-12 cancellation
    hazard."""
    if e_i.shape[0] == 0:
        return jnp.zeros((), x.dtype)
    d = x[e_i] - x[e_j]
    if tilt is None:
        L = jnp.asarray(box, x.dtype)
        d = d - L * jnp.round(d / L)
    else:
        from .box import box_matrix, min_image_round

        H = box_matrix(box, tilt)
        # intramolecular pairs sit far below half the min perpendicular
        # width: the rounded image is exact there
        d = min_image_round(d, jnp.asarray(H, x.dtype),
                            jnp.asarray(np.linalg.inv(H), x.dtype))
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    qq = q[e_i] * q[e_j]
    erf_term = KE * qq * jax.lax.erf(alpha * r) / r
    bare = KE * qq / r
    # want se * bare total; reciprocal provided erf_term; real-space
    # kernel provided nothing for these pairs (masked/corrected there)
    return jnp.sum(se * bare - erf_term)


def ewald_energy_dense(
    x: jax.Array, q: jax.Array,
    box: Tuple[float, float, float],
    cutoff: float,
    *,
    alpha: Optional[float] = None,
    shape: Optional[Tuple[int, int, int]] = None,
    tilt: Optional[Tuple[float, float, float]] = None,
) -> jax.Array:
    """Complete PME electrostatic energy with the dense real-space
    reference — the validation path (Madelung tests) and the oracle the
    cell-kernel PME mode is checked against."""
    a = ewald_alpha(cutoff) if alpha is None else alpha
    if shape is None:
        if tilt is None:
            s = pme_grid_shape(box)
        else:
            from .box import box_matrix

            H = box_matrix(box, tilt)
            s = pme_grid_shape(tuple(np.linalg.norm(H[i])
                                     for i in range(3)))
    else:
        s = shape
    return (real_space_energy_dense(x, q, box, cutoff, a, tilt=tilt)
            + reciprocal_energy(x, q, box, a, s, tilt=tilt)
            + self_energy(q, a)
            + background_energy(q, box, a))


__all__ = [
    "SPLINE_ORDER", "ewald_alpha", "pme_grid_shape", "spread_charges",
    "spread_charges_precise", "reciprocal_energy", "self_energy",
    "background_energy", "real_space_energy_dense",
    "excluded_pair_correction", "ewald_energy_dense",
]
