"""Tiled Pallas pair-stage kernel: protein-scale dense nonbonded + GB.

The small-system fused kernel (md/pallas_md.py) holds whole (R, N, N)
pair tensors in VMEM — impossible past N ~ 350. The XLA dense path works
at any N but materializes ~dozens of (N, N) f32 temporaries in HBM every
step (3gd8, N=3350: 23.6 ms/step, ~7 ns/day). Gather-based neighbor lists
are 40x WORSE on TPU (md/nblist.py caveat).

This kernel computes the same dense NoCutoff physics in ROW TILES: a grid
step owns TI atoms, loads the full coordinate/parameter rows (tiny: O(N)),
and computes its (TI, N) pair block entirely in VMEM — pair quantities are
recomputed, never stored to HBM. Three sweeps per force evaluation:

  1. Born descreening integral I_i (HCT + GBn2 neck),
  2. pair energy row-sums + the pairwise part of dE/dB_i,
  3. forces: F_i = -sum_j W_ij (x_i - x_j)/r with
     W = d(LJ+Coulomb+GB_direct)/dr + c_i dI_i/dr_ij + c_j dI_j/dr_ji,

with the tiny XLA glue (tanh rescale, self/SA terms, chain coefficients)
between sweeps. Per-step HBM traffic is O(N): since round 3 there is NO
O(N^2) data anywhere — exclusions use the index-band scheme
(md/cells.py C_FEAT note: LJ/Coulomb pairs with |i-j| <= D are masked
in-kernel and added back exactly by a roll-based banded XLA pass; GB
terms stay unmasked, Born screening counts bonded pairs) and GBn2 neck
d0/m0 lookups are MXU matmuls over (C, C) radius-class matrices
(d0_ij = onehot_i @ D0_class @ onehot_j^T). This unblocks implicit
systems past the ~12k-atom (N, N)-matrix memory wall: a 16,750-atom
GBn2 system builds in 3.4 s and evaluates at 67 ms/force (previously
needed 8.8 GB of tables).

Measured design notes (v5e, 3gd8, 2.68 ms/step round-2 baseline):
- round 2 tried scale-1 kernels + a SPARSE gather correction over the
  ~17k excluded pairs: 14% slower — gathers serialize (the md/nblist.py
  lesson). Streaming dense (N, N) scale tiles won then.
- round 3's banded add-back with GATHERED partner rows cost 5.67
  ms/step (same gather effect); with ROLLED partner rows it is 2.92
  ms/step — within 9% of the dense-streaming design while eliminating
  the O(N^2) memory entirely.

Validation: energies/forces vs the dense XLA path (tests/unit/
test_pallas_pair.py on CPU math via the shared formulas is not possible —
Mosaic-only PRNG is not used here, so ``interpret=True`` works on CPU).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
from .ff_params import OBC2_ALPHA, OBC2_BETA, OBC2_GAMMA
from .system import System

_EPS = 1e-12


def _radius_classes(rho: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(class_values (C,), onehot (N, C)) for the distinct offset radii."""
    vals, inv = np.unique(np.round(rho, 9), return_inverse=True)
    onehot = np.zeros((len(rho), len(vals)), dtype=np.float32)
    onehot[np.arange(len(rho)), inv] = 1.0
    return vals, onehot


def _morton_order(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Spatial (Morton/Z-order) permutation: index-contiguous tiles
    become spatially COMPACT blobs, which is what makes bounding-box
    tile culling effective when the chain folds back through space.
    Host-side, build time only (the permutation is static; culling
    CORRECTNESS never depends on it — tile AABBs are recomputed
    from live positions every force evaluation)."""
    x = np.asarray(x, np.float64)
    lo = x.min(axis=0)
    span = max(float((x.max(axis=0) - lo).max()), 1e-9)
    g = np.clip(((x - lo) / span * (2**bits - 1)).astype(np.uint64),
                0, np.uint64(2**bits - 1))

    def part1by2(v):
        v = v & np.uint64(0x3FF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x30000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x9249249)
        return v

    code = (part1by2(g[:, 0]) | (part1by2(g[:, 1]) << np.uint64(1))
            | (part1by2(g[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable").astype(np.int32)


def build_pair_force_fn(
    system: System,
    *,
    tile: int = 256,
    interpret: bool = False,
    gb_cutoff: "float | None" = None,
    order_from=None,
    newton: "bool | None" = None,
    bonded: str = "auto",
) -> Callable:
    """Jitted ``fn(x (N,3)) -> (energy, forces (N,3))`` for the FULL
    potential: tiled-kernel pair stage + XLA bonded terms.

    ``tile`` must be a multiple of 8 (sublane) — atoms are zero-padded to
    a multiple of it. The dense exclusion scale matrices are streamed in
    row tiles, so memory residency is the matrices themselves (usable to
    N ~ 15k on a 16 GB HBM chip).

    ``gb_cutoff`` (nm) enables bounding-box TILE CULLING (VERDICT r3
    item #3 — the O(N^2)->o(N^2) path for large implicit systems): every
    pair interaction (LJ, Coulomb, GB cross term, Born descreening,
    neck) is truncated at r > gb_cutoff, and the kernel then SKIPS whole
    (tile, tile) blocks whose axis-aligned bounding boxes are provably
    farther apart than the cutoff (per-tile AABBs recomputed from live
    positions each evaluation, so the skip is exact, never stale).
    Use tile=128 here: finer tiles bound tighter (computed fraction 0.20
    vs 0.30 at 26.8k atoms) and the pair math is VPU-bound either way. Truncating the
    COMBINED electrostatics is the standard GB-cutoff approximation: at
    r >> B the direct Coulomb and the GB cross term cancel to the
    solvent-screened tail q_i q_j / (eps_water r) — ~1/80 of vacuum
    Coulomb (the same physics OpenMM's CutoffNonPeriodic GB relies on).
    ``order_from`` (positions (n_atoms, 3)) applies a build-time Morton
    reorder so tiles are spatially compact; exclusion semantics are
    unaffected (the index-band mask keys on ORIGINAL atom indices
    carried in the kernel's index channel).

    The culled path is for THERMOSTATTED dynamics (Langevin/NVT): the
    cutoff is a hard truncation (no switching window), so forces are
    discontinuous at r = gb_cutoff — a Langevin thermostat absorbs the
    O(1/80-screened) kick, but microcanonical (NVE) runs would show
    spurious energy drift. For NVE conservation work use the dense path
    (gb_cutoff=None), whose potential is everywhere smooth.

    ``newton`` selects the SYMMETRIC-DEDUP block-list kernels (round 5):
    every unordered (row-tile, col-tile) block is computed ONCE — the
    kernel evaluates both interaction directions in one pass (Newton's
    third law for the force; both Born/dEdB attributions) and scatters
    to row atoms (revisited row-block outputs, streaks detected from
    the scalar-prefetched block list) and to column atoms (a full-width
    revisited accumulator updated at dynamic lane offsets). The grid
    runs over a flat row-major block list, so Mosaic pipelines the
    block DMAs via index maps — no in-kernel dynamic-slice loop at all.
    This roughly halves pair-sweep work vs the ordered kernels (hct is
    evaluated per direction either way; everything else is shared).
    Default: True for the culled path, False for dense (the fully
    static dense kernels measure faster at small N where the whole row
    fits one grid step).

    ``bonded`` selects how the bonded terms compose into the step:
    ``"gather"`` is the XLA advanced-index formulation (value_and_grad);
    ``"window"`` routes them through the block-windowed one-hot Pallas
    kernel (md/bonded_window.py — analytic gradients, no gather/scatter
    primitives). ``"auto"`` picks window on the culled large-N path
    where the gather glue dominates, gather otherwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tile % 128 != 0:
        raise ValueError("tile must be a multiple of 128 (lane blocking)")
    if order_from is not None and gb_cutoff is None:
        raise ValueError("order_from only affects the gb_cutoff path")
    if newton is None:
        newton = gb_cutoff is not None
    if bonded not in ("auto", "gather", "window"):
        raise ValueError("bonded must be auto|gather|window")
    if bonded == "auto":
        bonded = "window" if (gb_cutoff is not None
                              and system.n_atoms >= 8192) else "gather"

    n_real = system.n_atoms
    N = ((n_real + tile - 1) // tile) * tile
    GRID = N // tile
    pad = N - n_real

    perm = None
    if gb_cutoff is not None and order_from is not None:
        perm = _morton_order(np.asarray(order_from))
        if perm.shape[0] != n_real:
            raise ValueError("order_from must provide one position per atom")

    def P(a):
        """Apply the (optional) spatial permutation to a per-atom array."""
        a = np.asarray(a)
        return a[perm] if perm is not None else a

    def padded(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                      constant_values=fill)

    # --- per-atom parameter rows (host-side, padded, kernel order) ---------
    q = padded(P(system.charges))
    sig = padded(P(system.lj_sigma))
    # sqrt(eps) at the source: the Lorentz-Berthelot geometric
    # mean becomes an in-kernel multiply (one less per-pair sqrt)
    eps = np.sqrt(padded(P(system.lj_eps)))
    rho = padded(P(np.asarray(system.gb_radii) - system.gb_offset), fill=0.1)
    sr = padded(P(np.asarray(system.gb_screen)
                  * (np.asarray(system.gb_radii) - system.gb_offset)),
                fill=0.0)
    radii = padded(P(system.gb_radii), fill=0.11)
    mask = np.zeros(N, np.float32)
    mask[:n_real] = 1.0

    ke = COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 / system.solute_dielectric
    gb_pref = (
        -0.5 * COULOMB_CONSTANT_KJ_NM_PER_MOL_E2
        * (1.0 / system.solute_dielectric - 1.0 / system.solvent_dielectric)
    )
    probe = 0.14
    sa_coef = padded(
        P(system.surface_tension
          * (np.asarray(system.gb_radii) + probe) ** 2
          * np.asarray(system.gb_radii) ** 6),
        fill=0.0,
    )
    if system.gb_alpha is not None:
        ab = padded(P(system.gb_alpha), fill=1.0)
        bb = padded(P(system.gb_beta))
        gb = padded(P(system.gb_gamma))
    else:
        ab = np.full(N, OBC2_ALPHA, np.float32)
        bb = np.full(N, OBC2_BETA, np.float32)
        gb = np.full(N, OBC2_GAMMA, np.float32)

    # class matrices are derived from the per-atom radii here, so the
    # (N, N) neck tables need not exist (large systems skip building them)
    use_neck = system.gb_neck_scale != 0.0 and system.gb_model == "gbn2"
    if use_neck:
        from .gbn2 import lookup_neck

        cls_vals, onehot = _radius_classes(rho[:n_real])
        C = len(cls_vals)
        D0c, M0c = lookup_neck(
            np.repeat(cls_vals[:, None], C, 1), np.repeat(cls_vals[None, :], C, 0)
        )
        M0c = M0c * float(system.gb_neck_scale)
        oh = np.zeros((N, C), np.float32)
        oh[:n_real] = onehot
    else:
        C = 1
        D0c = np.zeros((1, 1)); M0c = np.zeros((1, 1))
        oh = np.zeros((N, C), np.float32)

    # index-band exclusions (md/cells.py C_FEAT note): LJ/Coulomb pairs
    # with |i-j| <= D are masked in-kernel and added back exactly in XLA
    # at their scaled value — no (N, N) scale tiles to build or stream,
    # which unblocks implicit systems past ~12k atoms. GB terms are NOT
    # masked: Born screening counts every pair, bonded included.
    from .cells import banded_scales, exclusion_band_width

    band_D = exclusion_band_width(system)
    band_se_np, band_sl_np, far_idx, far_se, far_sl = banded_scales(
        system, band_D
    )
    # the index channel carries ORIGINAL atom indices, so the band mask
    # |i-j| <= D keys on chemistry (bond topology adjacency), not on the
    # kernel's (possibly Morton-permuted) storage order
    idx_chan = np.full(N, -1e6, np.float32)
    idx_chan[:n_real] = P(np.arange(n_real)).astype(np.float32)

    use_gb = bool(system.use_gb)

    # --- kernel helpers ----------------------------------------------------
    _dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def pair_geometry(xi, xf):
        """(dd0..2, r, not_self) for a (TI, W) block. Self/coincident
        slots are pushed to r = 1 nm BEFORE any 1/r^k math — (sigma/r)^12
        at r ~ 0 is inf and inf * 0 poisons masked sums with NaN.
        Takes VALUES: (TI, 3) rows and a (3, W) column slab."""
        dd0 = xi[:, 0:1] - xf[0:1, :]         # (TI, W)
        dd1 = xi[:, 1:2] - xf[1:2, :]
        dd2 = xi[:, 2:3] - xf[2:3, :]
        r2 = dd0 * dd0 + dd1 * dd1 + dd2 * dd2
        not_self = (r2 > 1e-8).astype(xi.dtype)
        r = jnp.where(r2 > 1e-8, jnp.sqrt(r2 + _EPS), 1.0)
        return dd0, dd1, dd2, r, not_self

    def row(ref):
        return ref[...]                        # (TI, 1)

    def col(ref):
        return ref[...]                        # (1, N)

    def hct_terms(r, inv_r, rho_a, sr_b):
        """HCT integrand H(r; rho_a, sr_b) and dH/dr, masked-safe.

        rho_a: the integrating atom's offset radius (any broadcastable
        shape); sr_b: the descreener's scaled radius.
        """
        U_raw = r + sr_b
        inactive = U_raw <= rho_a
        U = jnp.where(inactive, rho_a + 1.0, U_raw)
        absd = jnp.abs(r - sr_b)
        sgn = jnp.sign(r - sr_b)
        use_rho = absd < rho_a
        L = jnp.where(use_rho, rho_a, absd)
        dL = jnp.where(use_rho, 0.0, sgn)
        inv_L = 1.0 / L
        inv_U = 1.0 / U
        log_LU = jnp.log(L * inv_U)
        quad = r - sr_b * sr_b * inv_r
        H = (inv_L - inv_U
             + 0.25 * quad * (inv_U * inv_U - inv_L * inv_L)
             + 0.5 * log_LU * inv_r)
        engulfed = (sr_b - r) > rho_a
        H = H + jnp.where(engulfed, 2.0 * (1.0 / rho_a - inv_L), 0.0)
        dquad = 1.0 + sr_b * sr_b * inv_r * inv_r
        dH = (-dL * inv_L * inv_L
              + inv_U * inv_U
              + 0.25 * dquad * (inv_U * inv_U - inv_L * inv_L)
              + 0.25 * quad * (-2.0 * inv_U**3 + 2.0 * dL * inv_L**3)
              - 0.5 * log_LU * inv_r * inv_r
              + 0.5 * inv_r * (dL * inv_L - inv_U))
        dH = dH + jnp.where(engulfed, 2.0 * dL * inv_L * inv_L, 0.0)
        act = (~inactive).astype(r.dtype)
        return H * act, dH * act

    def neck_tile(ohi, ohN, d0c, m0c, r):
        """(nv * scale, d(nv*scale)/dr) via class matmuls.

        ``ohi`` (TI, C) / ``ohN`` (C, W) are VALUES (not refs) so the
        culled chunk loop can feed lane slices through the same math."""
        d0 = _dot(_dot(ohi, d0c), ohN)              # (TI, W)
        m0s = _dot(_dot(ohi, m0c), ohN)
        u = r - d0
        u2 = u * u
        denom = 1.0 + 100.0 * u2 + 0.3e6 * u2 * u2 * u2
        nv = m0s / denom
        dnv = -(nv / denom) * (200.0 * u + 1.8e6 * u2 * u2 * u)
        return nv, dnv

    def self_mask(not_self, mask_i, mask_j):
        """1 for genuine pairs: both real atoms, not the self slot."""
        return mask_i * mask_j * not_self

    # ---- sweep 1: Born integral -------------------------------------------
    def born_kernel(xi_ref, xf_ref, rho_i_ref, mask_i_ref, sr_j_ref,
                    mask_j_ref, oh_i_ref, oh_all_ref, d0c_ref, m0c_ref,
                    I_ref):
        _, _, _, r, not_self = pair_geometry(xi_ref[...], xf_ref[...])
        one = self_mask(not_self, row(mask_i_ref), col(mask_j_ref))
        inv_r = 1.0 / r
        H, _ = hct_terms(r, inv_r, row(rho_i_ref), col(sr_j_ref))
        I = 0.5 * jnp.sum(H * one, axis=1, keepdims=True)
        if use_neck:
            nv, _ = neck_tile(oh_i_ref[...], oh_all_ref[...], d0c_ref[...], m0c_ref[...], r)
            I = I + jnp.sum(nv * one, axis=1, keepdims=True)
        I_ref[...] = I

    # ---- sweep 2: pair energy + dEdB pair sum -----------------------------
    def energy_kernel(xi_ref, xf_ref, q_i_ref, q_j_ref, sig_i_ref,
                      sig_j_ref, eps_i_ref, eps_j_ref, ib_i_ref, ib_j_ref,
                      B_i_ref, B_j_ref, mask_i_ref, mask_j_ref,
                      e_ref, dEdB_ref):
        _, _, _, r, not_self = pair_geometry(xi_ref[...], xf_ref[...])
        one = self_mask(not_self, row(mask_i_ref), col(mask_j_ref))
        inv_r = 1.0 / r
        sig_ij = 0.5 * (row(sig_i_ref) + col(sig_j_ref))
        eps_ij = row(eps_i_ref) * col(eps_j_ref)  # rows carry sqrt(eps)
        sr6 = (sig_ij * inv_r) ** 6
        # index-band mask (exclusions/1-4s added back in XLA)
        ob = (jnp.abs(row(ib_i_ref) - col(ib_j_ref)) > band_D).astype(r.dtype)
        e_lj = 4.0 * eps_ij * (sr6 * sr6 - sr6) * ob
        qq = row(q_i_ref) * col(q_j_ref)
        e_el = ke * qq * inv_r * ob
        e_row = 0.5 * jnp.sum((e_lj + e_el) * one, axis=1, keepdims=True)
        # (r is pushed to 1 nm at self/coincident slots, so e_lj is finite
        # everywhere and the mask multiply above is NaN-safe)
        if use_gb:
            Bi = row(B_i_ref)
            Bj = col(B_j_ref)
            BB = Bi * Bj
            expu = jnp.exp(-(r * r) / (4.0 * BB))
            f2 = r * r + BB * expu
            f = jnp.sqrt(f2)
            inv_f = 1.0 / f
            qq_gb = gb_pref * qq           # ordered-pair GB prefactor
            # cross energy: sum over BOTH ordered directions = 2x unordered,
            # and the 0.5 row factor restores per-ordered-pair counting
            e_row = e_row + jnp.sum(qq_gb * inv_f * one, axis=1,
                                    keepdims=True)
            dEdf = -qq_gb * inv_f * inv_f * one
            dfdBi = expu * (Bj + r * r / (4.0 * Bi)) * (0.5 * inv_f)
            dEdB_ref[...] = jnp.sum(dEdf * dfdBi, axis=1, keepdims=True)
        else:
            dEdB_ref[...] = jnp.zeros_like(e_row)
        e_ref[...] = e_row

    # ---- sweep 3: forces ---------------------------------------------------
    def force_kernel(xi_ref, xf_ref, q_i_ref, q_j_ref, sig_i_ref, sig_j_ref,
                     eps_i_ref, eps_j_ref, ib_i_ref, ib_j_ref, B_i_ref, B_j_ref,
                     c_i_ref, c_j_ref, rho_i_ref, rho_j_ref, sr_i_ref,
                     sr_j_ref, mask_i_ref, mask_j_ref, oh_i_ref, oh_all_ref,
                     d0c_ref, m0c_ref, F_ref):
        dd0, dd1, dd2, r, not_self = pair_geometry(xi_ref[...], xf_ref[...])
        one = self_mask(not_self, row(mask_i_ref), col(mask_j_ref))
        inv_r = 1.0 / r
        inv_r2 = inv_r * inv_r
        sig_ij = 0.5 * (row(sig_i_ref) + col(sig_j_ref))
        eps_ij = row(eps_i_ref) * col(eps_j_ref)  # rows carry sqrt(eps)
        sr6 = (sig_ij * inv_r) ** 6
        ob = (jnp.abs(row(ib_i_ref) - col(ib_j_ref)) > band_D).astype(r.dtype)
        # d(LJ)/dr + d(Coulomb)/dr (full unordered pair, band-masked;
        # GB terms below stay unmasked — screening counts bonded pairs)
        W = (4.0 * eps_ij * (-12.0 * sr6 * sr6 + 6.0 * sr6) * inv_r * ob)
        qq = row(q_i_ref) * col(q_j_ref)
        W = W - ke * qq * inv_r2 * ob
        if use_gb:
            Bi = row(B_i_ref)
            Bj = col(B_j_ref)
            BB = Bi * Bj
            expu = jnp.exp(-(r * r) / (4.0 * BB))
            f = jnp.sqrt(r * r + BB * expu)
            inv_f = 1.0 / f
            qq_gb = gb_pref * 2.0 * qq
            dEdf = -qq_gb * inv_f * inv_f
            dfdr = r * (1.0 - 0.25 * expu) * inv_f
            W = W + dEdf * dfdr
            # chain terms: c_i dI_i/dr_ij + c_j dI_j/dr_ji
            _, dH_ij = hct_terms(r, inv_r, row(rho_i_ref), col(sr_j_ref))
            _, dH_ji = hct_terms(r, inv_r, col(rho_j_ref), row(sr_i_ref))
            dIdr_ij = 0.5 * dH_ij
            dIdr_ji = 0.5 * dH_ji
            if use_neck:
                nv, dnv = neck_tile(oh_i_ref[...], oh_all_ref[...], d0c_ref[...], m0c_ref[...], r)
                dIdr_ij = dIdr_ij + dnv   # neck symmetric in (i, j)
                dIdr_ji = dIdr_ji + dnv
            W = W + row(c_i_ref) * dIdr_ij + col(c_j_ref) * dIdr_ji
        W = W * one * inv_r
        f0 = -jnp.sum(W * dd0, axis=1, keepdims=True)
        f1 = -jnp.sum(W * dd1, axis=1, keepdims=True)
        f2_ = -jnp.sum(W * dd2, axis=1, keepdims=True)
        F_ref[...] = jnp.concatenate([f0, f1, f2_], axis=1)

    # --- pallas_call plumbing ----------------------------------------------
    vmem = pltpu.VMEM
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def row_spec(width):
        return pl.BlockSpec((tile, width), (lambda i: (i, 0)),
                            memory_space=vmem)

    def bcast_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda *_: (0,) * nd), memory_space=vmem)

    col_arrays = {
        "q": q[None, :], "sig": sig[None, :], "eps": eps[None, :],
        "rho": rho[None, :], "sr": sr[None, :], "mask": mask[None, :],
    }
    row_arrays = {k: v[0][:, None] for k, v in col_arrays.items()}
    oh_rows = oh                               # (N, C)
    oh_cols = oh.T.copy()                      # (C, N)

    def sweep1(xT, xf):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(row_arrays["rho"]), jnp.asarray(row_arrays["mask"]),
            jnp.asarray(col_arrays["sr"]), jnp.asarray(col_arrays["mask"]),
            jnp.asarray(oh_rows), jnp.asarray(oh_cols),
            jnp.asarray(D0c, jnp.float32), jnp.asarray(M0c, jnp.float32),
        ]
        specs = [
            row_spec(3), bcast_spec((3, N)),
            row_spec(1), row_spec(1),
            bcast_spec((1, N)), bcast_spec((1, N)),
            row_spec(C), bcast_spec((C, N)),
            bcast_spec(D0c.shape), bcast_spec(M0c.shape),
        ]
        return pl.pallas_call(
            born_kernel, grid=(GRID,), compiler_params=params,
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            in_specs=specs, out_specs=row_spec(1), interpret=interpret,
        )(*ins)

    def sweep2(xT, xf, B):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(row_arrays["q"]), jnp.asarray(col_arrays["q"]),
            jnp.asarray(row_arrays["sig"]), jnp.asarray(col_arrays["sig"]),
            jnp.asarray(row_arrays["eps"]), jnp.asarray(col_arrays["eps"]),
            jnp.asarray(idx_chan[:, None]), jnp.asarray(idx_chan[None, :]),
            B[:, None], B[None, :],
            jnp.asarray(row_arrays["mask"]), jnp.asarray(col_arrays["mask"]),
        ]
        specs = [
            row_spec(3), bcast_spec((3, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
        ]
        return pl.pallas_call(
            energy_kernel, grid=(GRID,), compiler_params=params,
            out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.float32),
                       jax.ShapeDtypeStruct((N, 1), jnp.float32)),
            in_specs=specs, out_specs=(row_spec(1), row_spec(1)),
            interpret=interpret,
        )(*ins)

    def sweep3(xT, xf, B, c_chain):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(row_arrays["q"]), jnp.asarray(col_arrays["q"]),
            jnp.asarray(row_arrays["sig"]), jnp.asarray(col_arrays["sig"]),
            jnp.asarray(row_arrays["eps"]), jnp.asarray(col_arrays["eps"]),
            jnp.asarray(idx_chan[:, None]), jnp.asarray(idx_chan[None, :]),
            B[:, None], B[None, :],
            c_chain[:, None], c_chain[None, :],
            jnp.asarray(row_arrays["rho"]), jnp.asarray(col_arrays["rho"]),
            jnp.asarray(row_arrays["sr"]), jnp.asarray(col_arrays["sr"]),
            jnp.asarray(row_arrays["mask"]), jnp.asarray(col_arrays["mask"]),
            jnp.asarray(oh_rows), jnp.asarray(oh_cols),
            jnp.asarray(D0c, jnp.float32), jnp.asarray(M0c, jnp.float32),
        ]
        specs = [
            row_spec(3), bcast_spec((3, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(1), bcast_spec((1, N)),
            row_spec(C), bcast_spec((C, N)),
            bcast_spec(D0c.shape), bcast_spec(M0c.shape),
        ]
        return pl.pallas_call(
            force_kernel, grid=(GRID,), compiler_params=params,
            out_shape=jax.ShapeDtypeStruct((N, 3), jnp.float32),
            in_specs=specs, out_specs=row_spec(3), interpret=interpret,
        )(*ins)

    rho_j = jnp.asarray(rho)
    radii_j = jnp.asarray(radii)
    q_j = jnp.asarray(q)
    sa_j = jnp.asarray(sa_coef)
    ab_j, bb_j, gb_j = jnp.asarray(ab), jnp.asarray(bb), jnp.asarray(gb)
    mask_j = jnp.asarray(mask)

    # Bonded terms: measured IN-SCAN on v5e/3gd8, the gather formulation
    # (2.68 ms/step total) beats the roll-based gather-free alternative
    # (md/bonded_roll.py, 3.65 ms/step total) — standalone-dispatch
    # timings invert this, but they are RPC-dominated on the tunneled
    # device and not to be trusted. Keep gathers here; bonded_roll stays
    # available (exact-parity tested) for hardware where the trade flips.
    from .forces import angle_energy, bond_energy, torsion_energy

    def bonded_energy(x):
        return (bond_energy(system, x) + angle_energy(system, x)
                + torsion_energy(system, x))

    bonded_vg = None
    if bonded == "window":
        from .bonded_window import build_bonded_window

        bonded_vg = build_bonded_window(system, interpret=interpret)
    if bonded_vg is None:           # gather path, or no bonded terms
        def bonded_vg(x):
            return jax.value_and_grad(bonded_energy)(x)

    band_se_j = jnp.asarray(band_se_np)
    band_sl_j = jnp.asarray(band_sl_np)
    fb_i = jnp.asarray(far_idx[:, 0])
    fb_j = jnp.asarray(far_idx[:, 1])
    fb_se = jnp.asarray(far_se)
    fb_sl = jnp.asarray(far_sl)
    # ORIGINAL-ORDER parameter rows: the banded add-back and far-pair
    # corrections index the caller's x directly (q/sig above may be
    # Morton-permuted for the kernel; true eps — the padded kernel row
    # carries sqrt(eps))
    q_real = jnp.asarray(np.asarray(system.charges, np.float32))
    sig_real = jnp.asarray(np.asarray(system.lj_sigma, np.float32))
    eps_real = jnp.asarray(np.asarray(system.lj_eps, np.float32))

    def _wanted_implicit(r, qq, sig_ij, eps_ij, se_p, sl_p, valid):
        """NoCutoff implicit-path pair energy at the wanted scaling
        (plain Coulomb + unshifted LJ — the semantics the dense scale
        tiles used to encode). Excluded pairs contribute an exact zero,
        so nothing large ever cancels."""
        inv_r = 1.0 / r
        sr6 = (sig_ij * inv_r) ** 6
        lj = 4.0 * eps_ij * (sr6 * sr6 - sr6)
        return (lj * sl_p + ke * qq * inv_r * se_p) * valid

    def correction_energy(x):
        """Band add-back + far-pair replacement for the in-kernel
        index-band mask (md/cells.py C_FEAT note). Partner rows come
        from ROLLS, not gathers — a gathered (N, D, 3) partner array
        measured ~3 ms/step on 3gd8 (the md/nblist.py lesson again);
        rolls are contiguous shifts."""
        idx = jnp.arange(n_real)
        xj = jnp.stack(
            [jnp.roll(x, -k, axis=0) for k in range(1, band_D + 1)], axis=1
        )                                               # (N, D, 3)
        qj = jnp.stack(
            [jnp.roll(q_real, -k) for k in range(1, band_D + 1)], axis=1
        )
        sj = jnp.stack(
            [jnp.roll(sig_real, -k) for k in range(1, band_D + 1)], axis=1
        )
        ej = jnp.stack(
            [jnp.roll(eps_real, -k) for k in range(1, band_D + 1)], axis=1
        )
        offs = jnp.arange(1, band_D + 1)
        valid = (idx[:, None] + offs[None, :] < n_real).astype(x.dtype)
        d = x[:, None, :] - xj
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
        if gb_cutoff is not None:
            # cutoff semantics apply to the add-back too: an index-band
            # pair beyond the cutoff (e.g. chain-end atoms of different
            # molecules with adjacent indices) has a WANTED value of
            # exactly zero, same as every other far pair
            valid = valid * (r <= gb_cutoff).astype(x.dtype)
        qq = q_real[:, None] * qj
        sig_ij = 0.5 * (sig_real[:, None] + sj)
        eps_ij = jnp.sqrt(jnp.maximum(eps_real[:, None] * ej, 0.0))
        e = jnp.sum(_wanted_implicit(
            r, qq, sig_ij, eps_ij, band_se_j, band_sl_j, valid))
        if far_idx.shape[0]:
            dff = x[fb_i] - x[fb_j]
            rf = jnp.sqrt(jnp.sum(dff * dff, axis=-1) + _EPS)
            qq_f = q_real[fb_i] * q_real[fb_j]
            sig_f = 0.5 * (sig_real[fb_i] + sig_real[fb_j])
            eps_f = jnp.sqrt(jnp.maximum(eps_real[fb_i] * eps_real[fb_j], 0.0))
            ones = jnp.ones_like(rf)
            if gb_cutoff is not None:
                # beyond the cutoff the kernel counted nothing and the
                # wanted value is nothing — both legs vanish together
                ones = (rf <= gb_cutoff).astype(rf.dtype)
            e = e + jnp.sum(
                _wanted_implicit(rf, qq_f, sig_f, eps_f, fb_se * ones,
                                 fb_sl * ones, ones)
                - _wanted_implicit(rf, qq_f, sig_f, eps_f, ones, ones, ones)
            )
        return e

    def _make_force_fn(s1, s2, s3, prepare, finish, poison=None):
        """Shared assembly: Born pipeline + XLA glue around pluggable
        sweeps (the culled path swaps the sweeps and adds a permuted
        coordinate layout; the physics between sweeps is identical).
        ``poison(extra)`` returns a scalar added to energy AND forces —
        NaN when the evaluation must not be trusted (tile-list
        overflow), 0 otherwise."""

        @jax.jit
        def force_fn(x):
            xp, extra = prepare(x)
            xf = xp.T                                       # (3, N)
            if use_gb:
                I = s1(xp, xf, extra)[:, 0]
                psi = I * rho_j
                g = ab_j * psi - bb_j * psi * psi + gb_j * psi**3
                t = jnp.tanh(g)
                inv_B = 1.0 / rho_j - t / radii_j
                inv_B = jnp.maximum(inv_B, 1e-3)
                B = 1.0 / inv_B
                gprime = ab_j - 2.0 * bb_j * psi + 3.0 * gb_j * psi * psi
                dB_dpsi = B * B * (1.0 - t * t) * gprime / radii_j
            else:
                B = jnp.ones((N,), jnp.float32)
                dB_dpsi = jnp.zeros((N,), jnp.float32)
            e_rows, dEdB_pair = s2(xp, xf, B, extra)
            e_pair = jnp.sum(e_rows)
            if use_gb:
                e_self = jnp.sum(gb_pref * q_j * q_j * (1.0 / B) * mask_j)
                e_sa = jnp.sum(sa_j * (1.0 / B) ** 6 * mask_j)
                dEdB = (
                    2.0 * dEdB_pair[:, 0]
                    - gb_pref * q_j * q_j / (B * B)
                    - 6.0 * sa_j / B**7
                ) * mask_j
                c_chain = dEdB * dB_dpsi * rho_j
            else:
                e_self = e_sa = jnp.zeros(())
                c_chain = jnp.zeros((N,), jnp.float32)
            F_pair = finish(s3(xp, xf, B, c_chain, extra)[:n_real])
            e_c, g_c = jax.value_and_grad(correction_energy)(x)
            e_b, g_b = bonded_vg(x)
            energy = e_pair + e_c + e_self + e_sa + e_b
            forces = F_pair - g_c - g_b
            if poison is not None:
                bad = poison(extra)
                energy = energy + bad
                forces = forces + bad
            return energy, forces

        return force_fn

    def prepare_base(x):
        xp = jnp.zeros((N, 3), jnp.float32).at[:n_real].set(
            x.astype(jnp.float32))
        return xp, None

    if gb_cutoff is None and not newton:
        return _make_force_fn(
            lambda xp, xf, _m: sweep1(xp, xf),
            lambda xp, xf, B, _m: sweep2(xp, xf, B),
            lambda xp, xf, B, c, _m: sweep3(xp, xf, B, c),
            prepare_base, lambda F: F,
        )

    if newton:
        return _build_newton_path(
            system=system, tile=tile, interpret=interpret,
            gb_cutoff=gb_cutoff, order_from=order_from,
            n_real=n_real, N=N, GRID=GRID, pad=pad, perm=perm,
            row_arrays=row_arrays, col_arrays=col_arrays,
            oh_rows=oh_rows, oh_cols=oh_cols, D0c=D0c, M0c=M0c, C=C,
            idx_chan=idx_chan, band_D=band_D, ke=ke, gb_pref=gb_pref,
            use_gb=use_gb, use_neck=use_neck, params=params,
            make_force_fn=_make_force_fn, pl=pl, pltpu=pltpu,
            pair_geometry=pair_geometry, hct_terms=hct_terms,
            neck_tile=neck_tile,
        )

    # ----- bounding-box tile culling via a TILE-level neighbor list --------
    # Per evaluation (XLA, O(GRID^2) scalar work — trivial): per-tile
    # AABBs from live positions, a (GRID, GRID) box-gap test, and a
    # compacted per-row list of close chunk ids padded to a STATIC width
    # K with -1. The kernels scalar-prefetch the list (SMEM) and loop
    # over K entries, dynamic-lane-slicing the (TI, tile) column chunk
    # per id — md/cells.py's 128-aligned-slice precedent plus the pallas
    # guide's PrefetchScalarGridSpec pattern. Correctness: a skipped
    # chunk's box gap exceeds the cutoff => every pair distance exceeds
    # the cutoff => its cutoff-masked contribution is exactly zero; the
    # list is recomputed every evaluation, so skips are never stale. If
    # more chunks come into range than K (atoms drifted far from the
    # build geometry), the evaluation POISONS loudly (NaN) rather than
    # silently truncating. The compacted list replaces the first
    # design's per-chunk in-kernel cull test: GRID-length loops spent
    # ~60% of wall on skipped iterations (52.9 ms at 26.8k where the
    # computed fraction predicts ~24); K-length loops do mostly real
    # work. AABB gaps measured ~1.7x tighter than bounding spheres on
    # Morton-ordered assemblies (fraction 0.20 vs 0.36, 26.8k/tile 128).
    cutf = float(gb_cutoff)

    def _np_chunk_counts(xp_np):
        xr = xp_np.reshape(GRID, tile, 3)
        lo = xr.min(1)
        hi = xr.max(1)
        g1 = lo[:, None, :] - hi[None, :, :]
        g2 = lo[None, :, :] - hi[:, None, :]
        gap = np.maximum(0.0, np.maximum(g1, g2))
        close = (gap ** 2).sum(-1) <= cutf * cutf
        return close.sum(1)

    #: chunks processed per loop iteration. The dynamic-bound fori_loop
    #: costs ~2x the dense kernel's per-block rate in loop overhead
    #: (measured r5: 4.9 vs 2.7 us/block at 26.8k); unrolling amortizes
    #: it. Padding iterations carry a validity weight folded into the
    #: existing pair mask, so the physics is exact.
    UNROLL = 8

    if order_from is not None:
        x0p = np.asarray(order_from, np.float32)
        if perm is not None:
            x0p = x0p[perm]
        if pad:
            x0p = np.concatenate([x0p, np.repeat(x0p[-1:], pad, 0)])
        K = int(min(GRID,
                    int(np.ceil(1.35 * _np_chunk_counts(x0p).max())) + 4))
    else:
        # no build geometry: full-width lists (correct, no loop savings)
        K = GRID
    K = ((K + UNROLL - 1) // UNROLL) * UNROLL

    def row_spec_c(width):
        return pl.BlockSpec((tile, width), (lambda i, ids, cnt: (i, 0)),
                            memory_space=vmem)

    def bcast_spec_c(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i, ids, cnt, _n=nd: (0,) * _n),
                            memory_space=vmem)

    def _chunk_slices(c, *refs):
        off = pl.multiple_of(c * tile, 128)
        return [r[:, pl.ds(off, tile)] for r in refs]

    def born_culled(ids_ref, counts_ref, xi_ref, xf_ref, rho_i_ref, mask_i_ref,
                    sr_j_ref, mask_j_ref, oh_i_ref, oh_all_ref,
                    d0c_ref, m0c_ref, I_ref):
        i = pl.program_id(0)
        xi = xi_ref[...]
        rho_i = rho_i_ref[...]
        mask_i = mask_i_ref[...]
        ohi = oh_i_ref[...]
        d0c = d0c_ref[...]
        m0c = m0c_ref[...]

        cnt = counts_ref[i]

        def compute(kk, a):
            c = ids_ref[i, kk]
            w = (kk < cnt).astype(jnp.float32)   # unroll-padding weight
            xf, sr_j, mask_j = _chunk_slices(
                c, xf_ref, sr_j_ref, mask_j_ref)
            _, _, _, r, not_self = pair_geometry(xi, xf)
            one = (mask_i * mask_j * not_self
                   * (r <= cutf).astype(r.dtype)) * w
            inv_r = 1.0 / r
            H, _ = hct_terms(r, inv_r, rho_i, sr_j)
            part = 0.5 * jnp.sum(H * one, axis=1, keepdims=True)
            if use_neck:
                (ohN,) = _chunk_slices(c, oh_all_ref)
                nv, _ = neck_tile(ohi, ohN, d0c, m0c, r)
                part = part + jnp.sum(nv * one, axis=1, keepdims=True)
            return a + part

        def body(k0, acc):
            for off in range(UNROLL):
                acc = compute(k0 * UNROLL + off, acc)
            return acc

        # dynamic bound: ~this row's list length — rows near a dense
        # region loop longer, sparse rows exit early (K only bounds the
        # list WIDTH; max row degree is several x the mean on
        # Morton-ordered assemblies, so a static K bound wasted most
        # iterations as padded no-ops). UNROLL chunks per iteration
        # amortize the dynamic-loop overhead; weighted padding keeps it
        # exact.
        I_ref[...] = jax.lax.fori_loop(
            0, (cnt + UNROLL - 1) // UNROLL, body,
            jnp.zeros((tile, 1), jnp.float32))

    def energy_culled(ids_ref, counts_ref, xi_ref, xf_ref, q_i_ref, q_j_ref,
                      sig_i_ref, sig_j_ref, eps_i_ref, eps_j_ref,
                      ib_i_ref, ib_j_ref, B_i_ref, B_j_ref,
                      mask_i_ref, mask_j_ref, e_ref, dEdB_ref):
        i = pl.program_id(0)
        xi = xi_ref[...]
        q_i = q_i_ref[...]
        sig_i = sig_i_ref[...]
        eps_i = eps_i_ref[...]
        ib_i = ib_i_ref[...]
        B_i = B_i_ref[...]
        mask_i = mask_i_ref[...]

        cnt = counts_ref[i]

        def compute(kk, cr):
            c = ids_ref[i, kk]
            w = (kk < cnt).astype(jnp.float32)
            if True:
                e_acc, d_acc = cr
                xf, q_jv, sig_jv, eps_jv, ib_jv, B_jv, mask_jv = (
                    _chunk_slices(c, xf_ref, q_j_ref, sig_j_ref,
                                  eps_j_ref, ib_j_ref, B_j_ref,
                                  mask_j_ref))
                _, _, _, r, not_self = pair_geometry(xi, xf)
                one = (mask_i * mask_jv * not_self
                       * (r <= cutf).astype(r.dtype)) * w
                inv_r = 1.0 / r
                sig_ij = 0.5 * (sig_i + sig_jv)
                eps_ij = eps_i * eps_jv       # rows carry sqrt(eps)
                sr6 = (sig_ij * inv_r) ** 6
                ob = (jnp.abs(ib_i - ib_jv) > band_D).astype(r.dtype)
                e_lj = 4.0 * eps_ij * (sr6 * sr6 - sr6) * ob
                qq = q_i * q_jv
                e_el = ke * qq * inv_r * ob
                e_row = 0.5 * jnp.sum((e_lj + e_el) * one, axis=1,
                                      keepdims=True)
                if use_gb:
                    BB = B_i * B_jv
                    expu = jnp.exp(-(r * r) / (4.0 * BB))
                    f = jnp.sqrt(r * r + BB * expu)
                    inv_f = 1.0 / f
                    qq_gb = gb_pref * qq
                    e_row = e_row + jnp.sum(qq_gb * inv_f * one, axis=1,
                                            keepdims=True)
                    dEdf = -qq_gb * inv_f * inv_f * one
                    dfdBi = (expu * (B_jv + r * r / (4.0 * B_i))
                             * (0.5 * inv_f))
                    d_part = jnp.sum(dEdf * dfdBi, axis=1, keepdims=True)
                else:
                    d_part = jnp.zeros_like(e_row)
                return e_acc + e_row, d_acc + d_part

        def body(k0, carry):
            for off in range(UNROLL):
                carry = compute(k0 * UNROLL + off, carry)
            return carry

        z = jnp.zeros((tile, 1), jnp.float32)
        e, d = jax.lax.fori_loop(0, (cnt + UNROLL - 1) // UNROLL,
                                 body, (z, z))
        e_ref[...] = e
        dEdB_ref[...] = d

    def force_culled(ids_ref, counts_ref, xi_ref, xf_ref, q_i_ref, q_j_ref,
                     sig_i_ref, sig_j_ref, eps_i_ref, eps_j_ref,
                     ib_i_ref, ib_j_ref, B_i_ref, B_j_ref, c_i_ref,
                     c_j_ref, rho_i_ref, rho_j_ref, sr_i_ref, sr_j_ref,
                     mask_i_ref, mask_j_ref, oh_i_ref, oh_all_ref,
                     d0c_ref, m0c_ref, F_ref):
        i = pl.program_id(0)
        xi = xi_ref[...]
        q_i = q_i_ref[...]
        sig_i = sig_i_ref[...]
        eps_i = eps_i_ref[...]
        ib_i = ib_i_ref[...]
        B_i = B_i_ref[...]
        c_i = c_i_ref[...]
        rho_i = rho_i_ref[...]
        sr_i = sr_i_ref[...]
        mask_i = mask_i_ref[...]
        ohi = oh_i_ref[...]
        d0c = d0c_ref[...]
        m0c = m0c_ref[...]

        cnt = counts_ref[i]

        def compute(kk, cr):
            c = ids_ref[i, kk]
            w = (kk < cnt).astype(jnp.float32)
            if True:
                f0a, f1a, f2a = cr
                (xf, q_jv, sig_jv, eps_jv, ib_jv, B_jv, c_jv, rho_jv,
                 sr_jv, mask_jv) = _chunk_slices(
                    c, xf_ref, q_j_ref, sig_j_ref, eps_j_ref, ib_j_ref,
                    B_j_ref, c_j_ref, rho_j_ref, sr_j_ref, mask_j_ref)
                dd0, dd1, dd2, r, not_self = pair_geometry(xi, xf)
                one = (mask_i * mask_jv * not_self
                       * (r <= cutf).astype(r.dtype)) * w
                inv_r = 1.0 / r
                inv_r2 = inv_r * inv_r
                sig_ij = 0.5 * (sig_i + sig_jv)
                eps_ij = eps_i * eps_jv
                sr6 = (sig_ij * inv_r) ** 6
                ob = (jnp.abs(ib_i - ib_jv) > band_D).astype(r.dtype)
                W = (4.0 * eps_ij * (-12.0 * sr6 * sr6 + 6.0 * sr6)
                     * inv_r * ob)
                qq = q_i * q_jv
                W = W - ke * qq * inv_r2 * ob
                if use_gb:
                    BB = B_i * B_jv
                    expu = jnp.exp(-(r * r) / (4.0 * BB))
                    f = jnp.sqrt(r * r + BB * expu)
                    inv_f = 1.0 / f
                    qq_gb = gb_pref * 2.0 * qq
                    dEdf = -qq_gb * inv_f * inv_f
                    dfdr = r * (1.0 - 0.25 * expu) * inv_f
                    W = W + dEdf * dfdr
                    _, dH_ij = hct_terms(r, inv_r, rho_i, sr_jv)
                    _, dH_ji = hct_terms(r, inv_r, rho_jv, sr_i)
                    dIdr_ij = 0.5 * dH_ij
                    dIdr_ji = 0.5 * dH_ji
                    if use_neck:
                        (ohN,) = _chunk_slices(c, oh_all_ref)
                        nv, dnv = neck_tile(ohi, ohN, d0c, m0c, r)
                        dIdr_ij = dIdr_ij + dnv
                        dIdr_ji = dIdr_ji + dnv
                    W = W + c_i * dIdr_ij + c_jv * dIdr_ji
                W = W * one * inv_r
                return (f0a - jnp.sum(W * dd0, axis=1, keepdims=True),
                        f1a - jnp.sum(W * dd1, axis=1, keepdims=True),
                        f2a - jnp.sum(W * dd2, axis=1, keepdims=True))

        def body(k0, carry):
            for off in range(UNROLL):
                carry = compute(k0 * UNROLL + off, carry)
            return carry

        z = jnp.zeros((tile, 1), jnp.float32)
        f0, f1, f2_ = jax.lax.fori_loop(
            0, (cnt + UNROLL - 1) // UNROLL, body, (z, z, z))
        F_ref[...] = jnp.concatenate([f0, f1, f2_], axis=1)

    def sweep1_c(ids, counts, xT, xf):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(row_arrays["rho"]), jnp.asarray(row_arrays["mask"]),
            jnp.asarray(col_arrays["sr"]), jnp.asarray(col_arrays["mask"]),
            jnp.asarray(oh_rows), jnp.asarray(oh_cols),
            jnp.asarray(D0c, jnp.float32), jnp.asarray(M0c, jnp.float32),
        ]
        specs = [
            row_spec_c(3), bcast_spec_c((3, N)),
            row_spec_c(1), row_spec_c(1),
            bcast_spec_c((1, N)), bcast_spec_c((1, N)),
            row_spec_c(C), bcast_spec_c((C, N)),
            bcast_spec_c(D0c.shape), bcast_spec_c(M0c.shape),
        ]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(GRID,), in_specs=specs,
            out_specs=row_spec_c(1),
        )
        return pl.pallas_call(
            born_culled, grid_spec=gs, compiler_params=params,
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            interpret=interpret,
        )(ids, counts, *ins)

    def sweep2_c(ids, counts, xT, xf, B):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(row_arrays["q"]), jnp.asarray(col_arrays["q"]),
            jnp.asarray(row_arrays["sig"]), jnp.asarray(col_arrays["sig"]),
            jnp.asarray(row_arrays["eps"]), jnp.asarray(col_arrays["eps"]),
            jnp.asarray(idx_chan[:, None]), jnp.asarray(idx_chan[None, :]),
            B[:, None], B[None, :],
            jnp.asarray(row_arrays["mask"]), jnp.asarray(col_arrays["mask"]),
        ]
        specs = [
            row_spec_c(3), bcast_spec_c((3, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
        ]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(GRID,), in_specs=specs,
            out_specs=(row_spec_c(1), row_spec_c(1)),
        )
        return pl.pallas_call(
            energy_culled, grid_spec=gs, compiler_params=params,
            out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.float32),
                       jax.ShapeDtypeStruct((N, 1), jnp.float32)),
            interpret=interpret,
        )(ids, counts, *ins)

    def sweep3_c(ids, counts, xT, xf, B, c_chain):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(row_arrays["q"]), jnp.asarray(col_arrays["q"]),
            jnp.asarray(row_arrays["sig"]), jnp.asarray(col_arrays["sig"]),
            jnp.asarray(row_arrays["eps"]), jnp.asarray(col_arrays["eps"]),
            jnp.asarray(idx_chan[:, None]), jnp.asarray(idx_chan[None, :]),
            B[:, None], B[None, :],
            c_chain[:, None], c_chain[None, :],
            jnp.asarray(row_arrays["rho"]), jnp.asarray(col_arrays["rho"]),
            jnp.asarray(row_arrays["sr"]), jnp.asarray(col_arrays["sr"]),
            jnp.asarray(row_arrays["mask"]), jnp.asarray(col_arrays["mask"]),
            jnp.asarray(oh_rows), jnp.asarray(oh_cols),
            jnp.asarray(D0c, jnp.float32), jnp.asarray(M0c, jnp.float32),
        ]
        specs = [
            row_spec_c(3), bcast_spec_c((3, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(1), bcast_spec_c((1, N)),
            row_spec_c(C), bcast_spec_c((C, N)),
            bcast_spec_c(D0c.shape), bcast_spec_c(M0c.shape),
        ]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(GRID,), in_specs=specs,
            out_specs=row_spec_c(3),
        )
        return pl.pallas_call(
            force_culled, grid_spec=gs, compiler_params=params,
            out_shape=jax.ShapeDtypeStruct((N, 3), jnp.float32),
            interpret=interpret,
        )(ids, counts, *ins)

    perm_j = (jnp.asarray(perm, jnp.int32) if perm is not None else None)

    def prepare_culled(x):
        xg = x.astype(jnp.float32)
        if perm_j is not None:
            xg = xg[perm_j]
        if pad:
            # pad with the LAST real atom's position: padding stays
            # inside its tile's bounding box (masked from physics by
            # the mask channel; coincident slots are handled by
            # pair_geometry's not_self)
            xg = jnp.concatenate(
                [xg, jnp.broadcast_to(xg[-1:], (pad, 3))], axis=0)
        xr = xg.reshape(GRID, tile, 3)
        lo = jnp.min(xr, axis=1)
        hi = jnp.max(xr, axis=1)
        g1_ = lo[:, None, :] - hi[None, :, :]
        g2_ = lo[None, :, :] - hi[:, None, :]
        gap = jnp.maximum(0.0, jnp.maximum(g1_, g2_))
        close = jnp.sum(gap * gap, axis=-1) <= cutf * cutf  # (GRID, GRID)
        counts = jnp.sum(close, axis=1)
        order = jnp.argsort(~close, axis=1, stable=True)
        ow = order[:, :min(K, GRID)]
        if K > GRID:  # UNROLL rounding may pad past the grid width
            ow = jnp.concatenate(
                [ow, jnp.zeros((GRID, K - GRID), ow.dtype)], axis=1)
        # padding entries hold chunk 0 (a VALID slice target): unrolled
        # loop iterations read them but their validity weight zeroes
        # every pair term, so the physics is exact
        ids = jnp.where(
            jnp.arange(K)[None, :] < counts[:, None], ow, 0,
        ).astype(jnp.int32)
        overflow = jnp.max(counts) > K
        counts_c = jnp.minimum(counts, K).astype(jnp.int32)
        return xg, (ids, counts_c, overflow)

    def finish_culled(F):
        if perm_j is None:
            return F
        return jnp.zeros((n_real, 3), jnp.float32).at[perm_j].set(F)

    def poison_culled(extra):
        return jnp.where(extra[2], jnp.nan, 0.0).astype(jnp.float32)

    jitted = _make_force_fn(
        lambda xp, xf, ex: sweep1_c(ex[0], ex[1], xp, xf),
        lambda xp, xf, B, ex: sweep2_c(ex[0], ex[1], xp, xf, B),
        lambda xp, xf, B, c, ex: sweep3_c(ex[0], ex[1], xp, xf, B, c),
        prepare_culled, finish_culled, poison=poison_culled,
    )

    @jax.jit
    def _check_overflow(x):
        """True when the tile neighbor list at ``x`` needs more than K
        slots — the condition under which evaluations NaN-poison."""
        _, extra = prepare_culled(x)
        return extra[2]

    # host-visible overflow probe (advisor r4): long MD runs check this
    # per segment (md/integrate.run_md) and fail LOUDLY instead of
    # letting poisoned NaN frames flow into trajectories/checkpoints
    def fn(x, _j=jitted):
        return _j(x)

    fn.check_overflow = _check_overflow
    fn.tile_list_width = K
    return fn


def _build_newton_path(
    *, system, tile, interpret, gb_cutoff, order_from,
    n_real, N, GRID, pad, perm,
    row_arrays, col_arrays, oh_rows, oh_cols, D0c, M0c, C,
    idx_chan, band_D, ke, gb_pref, use_gb, use_neck, params,
    make_force_fn, pl, pltpu, pair_geometry, hct_terms, neck_tile,
):
    """Symmetric-dedup (Newton) block-list sweeps: see the ``newton``
    paragraph in :func:`build_pair_force_fn`.

    Layout contract: the grid iterates a flat ROW-MAJOR list of
    upper-triangular (row_tile, col_tile) block ids (culled by AABB gap
    when ``gb_cutoff`` is set; the full static triangle otherwise).
    Row-side results use revisited row-block outputs — a block whose
    row id differs from its predecessor's starts the row's streak and
    OVERWRITES; later blocks of the streak accumulate; Pallas flushes
    when the row id changes. Column-side results accumulate into one
    full-width (8, N) revisited output at dynamic lane offsets (rows
    used: sweep1 -> [I], sweep2 -> [dEdB], sweep3 -> [Fx, Fy, Fz]).
    Padding entries repeat the LAST REAL block's ids so streaks stay
    contiguous; their weight (k < n_blocks) zeroes the physics."""
    import jax
    import jax.numpy as jnp

    has_cut = gb_cutoff is not None
    cutf = float(gb_cutoff) if has_cut else 0.0
    vmem = pltpu.VMEM
    iu_np, ju_np = np.triu_indices(GRID)
    M = int(iu_np.shape[0])

    # --- block-list width (static) ------------------------------------
    if has_cut and order_from is not None:
        x0p = np.asarray(order_from, np.float32)
        if perm is not None:
            x0p = x0p[perm]
        if pad:
            x0p = np.concatenate([x0p, np.repeat(x0p[-1:], pad, 0)])
        xr0 = x0p.reshape(GRID, tile, 3)
        lo = xr0.min(1)
        hi = xr0.max(1)
        g1 = lo[:, None, :] - hi[None, :, :]
        g2 = lo[None, :, :] - hi[:, None, :]
        gap0 = np.maximum(0.0, np.maximum(g1, g2))
        close0 = (gap0 ** 2).sum(-1) <= cutf * cutf
        total0 = int(np.triu(close0).sum())
        # a GLOBAL total fluctuates less than per-row maxima (it
        # averages over rows), so the sizing margin can be tighter
        # than the ordered path's per-row 1.35x
        KT = min(M, int(np.ceil(1.25 * total0)) + 16)
    else:
        KT = M

    # --- kernels --------------------------------------------------------
    # per-atom parameter PLANES: seven (scalar) per-atom channels packed
    # into ONE (N, 8) row array and ONE (8, N) column array so each grid
    # step issues one row DMA + one column DMA instead of seven of each
    # (measured r5: per-step DMA descriptor overhead at ~5.6k grid steps
    # cost ~0.4 us/block before packing)
    _Q, _SIG, _EPS, _IB, _MASK, _RHO, _SR = range(7)

    def _sym_mask(r_id, c_id, r, not_self, mask_i, mask_j):
        """Once-per-unordered-pair validity: both atoms real, strict
        upper triangle in storage order (kills self pairs AND the
        double count on diagonal blocks; off-diagonal listed blocks
        have c > r so every lane passes), cutoff. List padding needs no
        weight here: padded blocks skip the whole predicated body."""
        rg = r_id * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        cg = c_id * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        one = mask_i * mask_j * not_self * (cg > rg).astype(r.dtype)
        if has_cut:
            one = one * (r <= cutf).astype(r.dtype)
        return one

    def _streak(ids_r_ref, k, r_id):
        return jnp.logical_or(k == 0,
                              r_id != ids_r_ref[jnp.maximum(k - 1, 0)])

    def _row_accum(ref, first, part):
        @pl.when(first)
        def _():
            ref[...] = part

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + part

    def _col_accum(ref, sub, off, part):
        ref[sub, pl.ds(off, tile)] = ref[sub, pl.ds(off, tile)] + part

    def born_sym(ids_r_ref, ids_c_ref, nblk_ref,
                 xi_ref, xf_ref, rp_ref, cp_ref, oh_i_ref, oh_j_ref,
                 d0c_ref, m0c_ref, I_row_ref, I_col_ref):
        k = pl.program_id(0)
        r_id = ids_r_ref[k]
        c_id = ids_c_ref[k]
        first = _streak(ids_r_ref, k, r_id)

        @pl.when(k == 0)
        def _():
            I_col_ref[...] = jnp.zeros_like(I_col_ref)

        @pl.when(k < nblk_ref[0])   # padding blocks skip ALL vector work
        def _():
            rp = rp_ref[...]
            cp = cp_ref[...]
            _, _, _, r, not_self = pair_geometry(xi_ref[...], xf_ref[...])
            one = _sym_mask(r_id, c_id, r, not_self,
                            rp[:, _MASK:_MASK + 1], cp[_MASK:_MASK + 1, :])
            inv_r = 1.0 / r
            H_ij, _ = hct_terms(r, inv_r, rp[:, _RHO:_RHO + 1],
                                cp[_SR:_SR + 1, :])
            H_ji, _ = hct_terms(r, inv_r, cp[_RHO:_RHO + 1, :],
                                rp[:, _SR:_SR + 1])
            Hw_ij = H_ij
            Hw_ji = H_ji
            if use_neck:
                nv, _ = neck_tile(oh_i_ref[...], oh_j_ref[...],
                                  d0c_ref[...], m0c_ref[...], r)
                # I = 0.5 sum H + sum nv: fold nv at 2x so the shared
                # 0.5 below restores it (neck is symmetric in i, j)
                nv2 = 2.0 * nv
                Hw_ij = Hw_ij + nv2
                Hw_ji = Hw_ji + nv2
            row_part = 0.5 * jnp.sum(Hw_ij * one, axis=1, keepdims=True)
            col_part = 0.5 * jnp.sum(Hw_ji * one, axis=0, keepdims=True)
            _row_accum(I_row_ref, first, row_part)
            off = pl.multiple_of(c_id * tile, 128)
            _col_accum(I_col_ref, slice(0, 1), off, col_part)

    def energy_sym(ids_r_ref, ids_c_ref, nblk_ref,
                   xi_ref, xf_ref, rp_ref, cp_ref, B_i_ref, B_j_ref,
                   e_ref, dEdB_row_ref, dEdB_col_ref):
        k = pl.program_id(0)
        r_id = ids_r_ref[k]
        c_id = ids_c_ref[k]
        first = _streak(ids_r_ref, k, r_id)

        @pl.when(k == 0)
        def _():
            dEdB_col_ref[...] = jnp.zeros_like(dEdB_col_ref)

        @pl.when(k < nblk_ref[0])
        def _():
            rp = rp_ref[...]
            cp = cp_ref[...]
            _, _, _, r, not_self = pair_geometry(xi_ref[...], xf_ref[...])
            one = _sym_mask(r_id, c_id, r, not_self,
                            rp[:, _MASK:_MASK + 1], cp[_MASK:_MASK + 1, :])
            inv_r = 1.0 / r
            sig_ij = 0.5 * (rp[:, _SIG:_SIG + 1] + cp[_SIG:_SIG + 1, :])
            # rows carry sqrt(eps)
            eps_ij = rp[:, _EPS:_EPS + 1] * cp[_EPS:_EPS + 1, :]
            sr6 = (sig_ij * inv_r) ** 6
            ob = (jnp.abs(rp[:, _IB:_IB + 1] - cp[_IB:_IB + 1, :])
                  > band_D).astype(r.dtype)
            qq = rp[:, _Q:_Q + 1] * cp[_Q:_Q + 1, :]
            # counted ONCE per unordered pair: no 0.5 (vs ordered sweeps)
            e_blk = (4.0 * eps_ij * (sr6 * sr6 - sr6)
                     + ke * qq * inv_r) * ob * one
            if use_gb:
                B_i = B_i_ref[...]
                B_j = B_j_ref[...]
                BB = B_i * B_j
                expu = jnp.exp(-(r * r) / (4.0 * BB))
                f = jnp.sqrt(r * r + BB * expu)
                inv_f = 1.0 / f
                qq_gb = gb_pref * qq
                # unordered GB cross energy = 2x the ordered-pair value
                e_blk = e_blk + 2.0 * qq_gb * inv_f * one
                # accumulate the ORDERED-direction quantity on each
                # side; the glue multiplies by 2 (same contract as the
                # ordered kernels' row-only dEdB)
                dEdf = -qq_gb * inv_f * inv_f * one
                dfdBi = expu * (B_j + r * r / (4.0 * B_i)) * (0.5 * inv_f)
                dfdBj = expu * (B_i + r * r / (4.0 * B_j)) * (0.5 * inv_f)
                drow = jnp.sum(dEdf * dfdBi, axis=1, keepdims=True)
                dcol = jnp.sum(dEdf * dfdBj, axis=0, keepdims=True)
            else:
                drow = jnp.zeros((tile, 1), jnp.float32)
                dcol = jnp.zeros((1, tile), jnp.float32)
            _row_accum(e_ref, first,
                       jnp.sum(e_blk, axis=1, keepdims=True))
            _row_accum(dEdB_row_ref, first, drow)
            off = pl.multiple_of(c_id * tile, 128)
            _col_accum(dEdB_col_ref, slice(0, 1), off, dcol)

    def force_sym(ids_r_ref, ids_c_ref, nblk_ref,
                  xi_ref, xf_ref, rp_ref, cp_ref, B_i_ref, B_j_ref,
                  c_i_ref, c_j_ref, oh_i_ref, oh_j_ref,
                  d0c_ref, m0c_ref, F_row_ref, F_col_ref):
        k = pl.program_id(0)
        r_id = ids_r_ref[k]
        c_id = ids_c_ref[k]
        first = _streak(ids_r_ref, k, r_id)

        @pl.when(k == 0)
        def _():
            F_col_ref[...] = jnp.zeros_like(F_col_ref)

        @pl.when(k < nblk_ref[0])
        def _():
            rp = rp_ref[...]
            cp = cp_ref[...]
            dd0, dd1, dd2, r, not_self = pair_geometry(
                xi_ref[...], xf_ref[...])
            one = _sym_mask(r_id, c_id, r, not_self,
                            rp[:, _MASK:_MASK + 1], cp[_MASK:_MASK + 1, :])
            inv_r = 1.0 / r
            inv_r2 = inv_r * inv_r
            sig_ij = 0.5 * (rp[:, _SIG:_SIG + 1] + cp[_SIG:_SIG + 1, :])
            eps_ij = rp[:, _EPS:_EPS + 1] * cp[_EPS:_EPS + 1, :]
            sr6 = (sig_ij * inv_r) ** 6
            ob = (jnp.abs(rp[:, _IB:_IB + 1] - cp[_IB:_IB + 1, :])
                  > band_D).astype(r.dtype)
            qq = rp[:, _Q:_Q + 1] * cp[_Q:_Q + 1, :]
            # W = dE/dr of the UNORDERED pair — identical to the ordered
            # kernels' W (which is symmetric under i<->j); computed once
            W = (4.0 * eps_ij * (-12.0 * sr6 * sr6 + 6.0 * sr6) * inv_r
                 - ke * qq * inv_r2) * ob
            if use_gb:
                B_i = B_i_ref[...]
                B_j = B_j_ref[...]
                BB = B_i * B_j
                expu = jnp.exp(-(r * r) / (4.0 * BB))
                f = jnp.sqrt(r * r + BB * expu)
                inv_f = 1.0 / f
                qq_gb = gb_pref * 2.0 * qq
                dEdf = -qq_gb * inv_f * inv_f
                dfdr = r * (1.0 - 0.25 * expu) * inv_f
                W = W + dEdf * dfdr
                _, dH_ij = hct_terms(r, inv_r, rp[:, _RHO:_RHO + 1],
                                     cp[_SR:_SR + 1, :])
                _, dH_ji = hct_terms(r, inv_r, cp[_RHO:_RHO + 1, :],
                                     rp[:, _SR:_SR + 1])
                dIdr_ij = 0.5 * dH_ij
                dIdr_ji = 0.5 * dH_ji
                if use_neck:
                    nv, dnv = neck_tile(oh_i_ref[...], oh_j_ref[...],
                                        d0c_ref[...], m0c_ref[...], r)
                    dIdr_ij = dIdr_ij + dnv
                    dIdr_ji = dIdr_ji + dnv
                W = W + c_i_ref[...] * dIdr_ij + c_j_ref[...] * dIdr_ji
            W = W * one * inv_r
            Wd0 = W * dd0
            Wd1 = W * dd1
            Wd2 = W * dd2
            # Newton: force on the row atom is -W dd; on the column +W dd
            row_part = jnp.concatenate(
                [-jnp.sum(Wd0, axis=1, keepdims=True),
                 -jnp.sum(Wd1, axis=1, keepdims=True),
                 -jnp.sum(Wd2, axis=1, keepdims=True)], axis=1)
            _row_accum(F_row_ref, first, row_part)
            off = pl.multiple_of(c_id * tile, 128)
            _col_accum(F_col_ref, slice(0, 1), off,
                       jnp.sum(Wd0, axis=0, keepdims=True))
            _col_accum(F_col_ref, slice(1, 2), off,
                       jnp.sum(Wd1, axis=0, keepdims=True))
            _col_accum(F_col_ref, slice(2, 3), off,
                       jnp.sum(Wd2, axis=0, keepdims=True))

    # --- pallas_call plumbing -------------------------------------------
    def rspec(w):
        return pl.BlockSpec((tile, w), (lambda k, r, c, n: (r[k], 0)),
                            memory_space=vmem)

    def cspec(s):
        return pl.BlockSpec((s, tile), (lambda k, r, c, n: (0, c[k])),
                            memory_space=vmem)

    def kspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda k, r, c, n, _n=nd: (0,) * _n),
                            memory_space=vmem)

    acc_spec = pl.BlockSpec((8, N), (lambda k, r, c, n: (0, 0)),
                            memory_space=pltpu.VMEM)

    def _call(kernel, ins, specs, out_shape, out_specs, scal):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(KT,), in_specs=specs,
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel, grid_spec=gs, compiler_params=params,
            out_shape=out_shape, interpret=interpret,
        )(*scal, *ins)

    # packed parameter planes (see the _Q.._SR note above the kernels)
    plane_cols = np.concatenate(
        [col_arrays["q"], col_arrays["sig"], col_arrays["eps"],
         idx_chan[None, :], col_arrays["mask"], col_arrays["rho"],
         col_arrays["sr"], np.zeros((1, N), np.float32)], axis=0,
    ).astype(np.float32)                                   # (8, N)
    plane_rows = np.ascontiguousarray(plane_cols.T)        # (N, 8)

    def sweep1_s(ids_r, ids_c, nblk, xT, xf):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(plane_rows), jnp.asarray(plane_cols),
            jnp.asarray(oh_rows), jnp.asarray(oh_cols),
            jnp.asarray(D0c, jnp.float32), jnp.asarray(M0c, jnp.float32),
        ]
        specs = [
            rspec(3), cspec(3), rspec(8), cspec(8), rspec(C), cspec(C),
            kspec(D0c.shape), kspec(M0c.shape),
        ]
        I_row, I_col = _call(
            born_sym, ins, specs,
            (jax.ShapeDtypeStruct((N, 1), jnp.float32),
             jax.ShapeDtypeStruct((8, N), jnp.float32)),
            (rspec(1), acc_spec), (ids_r, ids_c, nblk),
        )
        return I_row + I_col[0:1, :].T

    def sweep2_s(ids_r, ids_c, nblk, xT, xf, B):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(plane_rows), jnp.asarray(plane_cols),
            B[:, None], B[None, :],
        ]
        specs = [
            rspec(3), cspec(3), rspec(8), cspec(8), rspec(1), cspec(1),
        ]
        e_row, dEdB_row, dEdB_col = _call(
            energy_sym, ins, specs,
            (jax.ShapeDtypeStruct((N, 1), jnp.float32),
             jax.ShapeDtypeStruct((N, 1), jnp.float32),
             jax.ShapeDtypeStruct((8, N), jnp.float32)),
            (rspec(1), rspec(1), acc_spec), (ids_r, ids_c, nblk),
        )
        return e_row, dEdB_row + dEdB_col[0:1, :].T

    def sweep3_s(ids_r, ids_c, nblk, xT, xf, B, c_chain):
        ins = [
            jnp.asarray(xT), jnp.asarray(xf),
            jnp.asarray(plane_rows), jnp.asarray(plane_cols),
            B[:, None], B[None, :], c_chain[:, None], c_chain[None, :],
            jnp.asarray(oh_rows), jnp.asarray(oh_cols),
            jnp.asarray(D0c, jnp.float32), jnp.asarray(M0c, jnp.float32),
        ]
        specs = [
            rspec(3), cspec(3), rspec(8), cspec(8),
            rspec(1), cspec(1), rspec(1), cspec(1),
            rspec(C), cspec(C),
            kspec(D0c.shape), kspec(M0c.shape),
        ]
        F_row, F_col = _call(
            force_sym, ins, specs,
            (jax.ShapeDtypeStruct((N, 3), jnp.float32),
             jax.ShapeDtypeStruct((8, N), jnp.float32)),
            (rspec(3), acc_spec), (ids_r, ids_c, nblk),
        )
        return F_row + F_col[0:3, :].T

    # --- block-list construction ------------------------------------------
    iu_j = jnp.asarray(iu_np.astype(np.int32))
    ju_j = jnp.asarray(ju_np.astype(np.int32))
    perm_j = jnp.asarray(perm, jnp.int32) if perm is not None else None

    def _pad_positions(x):
        xg = x.astype(jnp.float32)
        if perm_j is not None:
            xg = xg[perm_j]
        if pad:
            xg = jnp.concatenate(
                [xg, jnp.broadcast_to(xg[-1:], (pad, 3))], axis=0)
        return xg

    if has_cut:
        def prepare(x):
            xg = _pad_positions(x)
            xr = xg.reshape(GRID, tile, 3)
            lo = jnp.min(xr, axis=1)
            hi = jnp.max(xr, axis=1)
            g1_ = lo[:, None, :] - hi[None, :, :]
            g2_ = lo[None, :, :] - hi[:, None, :]
            gap = jnp.maximum(0.0, jnp.maximum(g1_, g2_))
            close = jnp.sum(gap * gap, axis=-1) <= cutf * cutf
            cu = close[iu_j, ju_j]                       # (M,) upper blocks
            total = jnp.sum(cu.astype(jnp.int32))
            # static-size compaction keeps the list ROW-MAJOR (nonzero
            # returns ascending indices) at cumsum+scatter cost — the
            # argsort formulation measured 4-5 ms at GRID=210 on chip
            (flat,) = jnp.nonzero(cu, size=KT, fill_value=0)
            r_sel = jnp.take(iu_j, flat)
            c_sel = jnp.take(ju_j, flat)
            # padding entries REPEAT the last real block so row streaks
            # stay contiguous (a fresh row id would restart that row's
            # revisited output and overwrite it with zero-weight work)
            last = jnp.clip(total - 1, 0, KT - 1)
            last_r = jnp.take(r_sel, last)
            last_c = jnp.take(c_sel, last)
            inlist = jnp.arange(KT, dtype=jnp.int32) < total
            ids_r = jnp.where(inlist, r_sel, last_r).astype(jnp.int32)
            ids_c = jnp.where(inlist, c_sel, last_c).astype(jnp.int32)
            overflow = total > KT
            nblk = jnp.minimum(total, KT).astype(jnp.int32)[None]
            return xg, (ids_r, ids_c, nblk, overflow)
    else:
        ids_r_const = jnp.asarray(iu_np.astype(np.int32))
        ids_c_const = jnp.asarray(ju_np.astype(np.int32))
        nblk_const = jnp.asarray([M], jnp.int32)

        def prepare(x):
            return _pad_positions(x), (ids_r_const, ids_c_const,
                                       nblk_const, jnp.asarray(False))

    def finish(F):
        if perm_j is None:
            return F
        return jnp.zeros((n_real, 3), jnp.float32).at[perm_j].set(F)

    def poison(extra):
        if not has_cut:
            return jnp.zeros((), jnp.float32)
        return jnp.where(extra[3], jnp.nan, 0.0).astype(jnp.float32)

    jitted = make_force_fn(
        lambda xp, xf, ex: sweep1_s(ex[0], ex[1], ex[2], xp, xf),
        lambda xp, xf, B, ex: sweep2_s(ex[0], ex[1], ex[2], xp, xf, B),
        lambda xp, xf, B, c, ex: sweep3_s(ex[0], ex[1], ex[2], xp, xf, B, c),
        prepare, finish, poison=poison if has_cut else None,
    )

    def fn(x, _j=jitted):
        return _j(x)

    # stage-level introspection for the roofline harness
    # (scripts/roofline.py): NOT part of the public force-fn contract
    fn.debug_sweeps = (sweep1_s, sweep2_s, sweep3_s, prepare)
    fn.block_list_width = KT
    if has_cut:
        @jax.jit
        def _check_overflow(x):
            _, extra = prepare(x)
            return extra[3]

        fn.check_overflow = _check_overflow
        fn.tile_list_width = KT
    return fn


__all__ = ["build_pair_force_fn"]
