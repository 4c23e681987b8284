"""O(N) cell-list infrastructure for periodic nonbonded forces.

The round-2 framework computed every periodic force path against dense
(N, N) pair blocks (md/pallas_periodic.py), capping solvated systems at a
few thousand atoms — both in compute (O(N^2) pair math) and in memory
(streamed (N, N) exclusion matrices). This module provides the
TPU-native O(N) replacement (VERDICT r2 missing #1; the role OpenMM's
cell-list NonbondedForce plays for the reference,
/root/reference/src/pmarlo/simulation/__init__.py:64-71):

* bin atoms into an orthorhombic cell grid with cell edge >= cutoff, so
  the 27-cell neighborhood covers every pair within the cutoff;
* sort atoms by cell id and scatter into a fixed-capacity slot layout
  ``(n_cells, M)`` — static shapes, no per-atom neighbor lists, no
  gathers in the hot loop (md/nblist.py measured gather-bound 40x
  slower than dense on TPU);
* build a ghost-padded, periodically-shifted copy of the slot arrays so
  the kernel needs no minimum-image arithmetic and every neighbor run is
  CONTIGUOUS in memory (ghost cells carry pre-shifted coordinates);
* exclusions/1-4 scaling use the index-band scheme (see the C_FEAT
  note below): in-kernel masking of |i-j| <= D pairs + an exact banded
  XLA add-back, removing the (N, N) scale matrices entirely.

Channel layout: the per-slot feature array is ``(C_FEAT, S)`` with
channels [x, y, z, q, sigma, eps, mask, atom-index] — channel-major so
a kernel block is one 2D slice and coordinates arrive lane-contiguous.
(The cell force fn stores sqrt(eps) in channel 5 so the kernel's
Lorentz-Berthelot geometric mean is a multiply, not a per-pair sqrt.)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

C_FEAT = 8  # x, y, z, charge, sigma, eps, mask, atom index

#: Index-band exclusion handling. The kernel computes UNIFORM physics
#: but masks every pair whose atom indices differ by <= band width D;
#: those pairs are then added back in XLA at their WANTED (scaled)
#: value via a banded O(N*D) pass. Rationale: excluded/1-4 pairs sit at
#: bonded geometry where the full LJ term is enormous (r^-12 reaches
#: 1e6-1e14 kJ/mol when a constrained bond compresses) — subtracting a
#: kernel-counted term from XLA catastrophically cancels in f32 (force
#: errors of hundreds of kJ/mol/nm measured on chignolin's TRP ring).
#: Adding the band back at its wanted value involves no difference of
#: large numbers: excluded pairs contribute an EXACT zero. Exclusions
#: farther than D in index (disulfide bridges) stay in a sparse
#: correction list — they sit at moderate distances where subtraction
#: is safe. Waters/ions are automatically covered (indices adjacent).


@dataclasses.dataclass(frozen=True)
class CellGrid:
    """Static geometry of the cell decomposition (python ints/floats so
    everything downstream stays jit-static)."""

    box: Tuple[float, float, float]
    cutoff: float
    nx: int
    ny: int
    nz: int
    capacity: int              # M: atom slots per cell
    #: triclinic off-diagonals (bx, cx, cy), md/box.py reduced form;
    #: None -> orthorhombic. Cells are then parallelepipeds binned in
    #: FRACTIONAL coordinates; the 27-neighborhood cover argument runs
    #: through perpendicular slab widths instead of edge lengths.
    tilt: "Tuple[float, float, float] | None" = None

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def n_slots(self) -> int:
        return self.n_cells * self.capacity

    @property
    def cell_size(self) -> Tuple[float, float, float]:
        """Per-axis slab thickness bounding the neighborhood cover: the
        edge length for orthorhombic grids, the perpendicular width per
        cell layer for triclinic ones."""
        if self.tilt is None:
            return (self.box[0] / self.nx, self.box[1] / self.ny,
                    self.box[2] / self.nz)
        from .box import box_matrix, perp_widths

        pw = perp_widths(box_matrix(self.box, self.tilt))
        return (float(pw[0]) / self.nx, float(pw[1]) / self.ny,
                float(pw[2]) / self.nz)

    def matrices(self) -> Tuple[np.ndarray, np.ndarray]:
        """(H, Hinv) as float64 numpy (static jit constants)."""
        from .box import box_matrix

        H = box_matrix(self.box, self.tilt)
        return H, np.linalg.inv(H)


def make_cell_grid(
    box: Tuple[float, float, float],
    cutoff: float,
    n_atoms: int,
    *,
    occupancy_margin: float = 1.4,
    min_headroom: int = 8,
    lane_align: bool = False,
    tilt: "Tuple[float, float, float] | None" = None,
) -> CellGrid:
    """Choose the grid: max cells with edge >= cutoff per axis; capacity
    from mean occupancy with margin. Density fluctuations in liquids are
    percent-level, so a 40% margin plus headroom absorbs them; the force
    fn still raises a loud NaN if a cell ever overflows.

    ``lane_align``: round capacity so the kernel's block widths
    (nz * M rows, (nz+2) * M ghost run) are multiples of 128 — a Mosaic
    lowering requirement on real TPUs (interpret mode only needs the
    sublane multiple of 8)."""
    if tilt is None:
        widths = np.asarray(box, np.float64)
    else:
        from .box import box_matrix, perp_widths, validate_reduced

        H = box_matrix(box, tilt)
        validate_reduced(H)
        # the neighborhood-cover condition bounds the PERPENDICULAR
        # slab width per cell layer, not the (longer) edge length
        widths = perp_widths(H)
    nx = max(int(np.floor(widths[0] / cutoff)), 1)
    ny = max(int(np.floor(widths[1] / cutoff)), 1)
    nz = max(int(np.floor(widths[2] / cutoff)), 1)
    mean_occ = n_atoms / float(nx * ny * nz)
    cap = int(np.ceil(occupancy_margin * mean_occ)) + min_headroom
    if lane_align:
        # the kernel slices the z-column rows at offsets zc * M
        # (pallas_cells kernel: rows_ref[:, pl.ds(zc * M, M)]), and
        # Mosaic must statically prove every such offset is 128-aligned
        # — which requires M itself to be a multiple of 128. (The
        # weaker nz*M / (nz+2)*M rule compiled only when nz happened to
        # make each zc*M aligned, e.g. the 7x7x7/M=128 grid; a 4-cell
        # axis with M=192 was refused.)
        cap = ((cap + 127) // 128) * 128
    else:
        cap = ((cap + 7) // 8) * 8
    return CellGrid(box=tuple(float(b) for b in box), cutoff=float(cutoff),
                    nx=int(nx), ny=int(ny), nz=int(nz), capacity=int(cap),
                    tilt=(tuple(float(t) for t in tilt)
                          if tilt is not None else None))


def bin_atoms(grid: CellGrid, x: jax.Array, box: jax.Array | None = None):
    """Assign atoms to cells and compute slot indices.

    Returns (slot, cell_id, overflow) where ``slot`` is each atom's index
    into the flat (n_cells * capacity) slot space, and ``overflow`` is a
    scalar bool — True when some cell exceeded capacity (slots then clamp
    inside the cell; callers must poison the output).

    ``box`` (a traced (3,) array) overrides the grid's static box — the
    NPT path, where Monte-Carlo volume moves change the box inside one
    compiled program while the grid SHAPE (nx, ny, nz, capacity) stays
    static. Callers must keep box/n_cells >= cutoff (the cell force fn
    poisons the energy when a volume move breaks the cover)."""
    ncell = jnp.asarray([grid.nx, grid.ny, grid.nz], x.dtype)
    if grid.tilt is None:
        if box is None:
            box_arr = jnp.asarray(grid.box, x.dtype)
        else:
            box_arr = box.astype(x.dtype)
        # wrap into the primary box
        xw = x - jnp.floor(x / box_arr) * box_arr
        f = xw / box_arr
    else:
        # triclinic: bin on FRACTIONAL coordinates (x = f @ H); the
        # cells are parallelepipeds and the cover argument runs through
        # perpendicular slab widths (make_cell_grid). A traced ``box``
        # (NPT) carries the evolving diagonal; the tilt follows via the
        # grid's STATIC tilt ratios — the barostat's isotropic moves
        # never change them (md/box.py tilt_ratios).
        if box is None:
            H_np, Hinv_np = grid.matrices()
            Hj = jnp.asarray(H_np, x.dtype)
            Hinvj = jnp.asarray(Hinv_np, x.dtype)
        else:
            from .box import tilt_ratios, traced_matrices

            Hj, Hinvj = traced_matrices(
                box.astype(x.dtype), tilt_ratios(grid.box, grid.tilt)
            )
        from .box import latmul

        f = latmul(x, Hinvj)
        f = f - jnp.floor(f)
        xw = latmul(f, Hj)
    c = (f * ncell).astype(jnp.int32)
    cx = jnp.clip(c[:, 0], 0, grid.nx - 1)
    cy = jnp.clip(c[:, 1], 0, grid.ny - 1)
    cz = jnp.clip(c[:, 2], 0, grid.nz - 1)
    cid = (cx * grid.ny + cy) * grid.nz + cz

    # Within-cell rank. Three size-gated strategies, all producing the
    # SAME slot assignment (stable order = ascending atom index within a
    # cell):
    #   1. one-hot + cumsum counting rank — no sort at all; rank of atom
    #      i in its cell is the number of earlier atoms sharing the cell,
    #      read off an (N, C) inclusive prefix sum.  Fastest on TPU
    #      (1.51 ms vs 2.01 ms packed sort at 27k atoms / 343 cells) but
    #      O(N*C) transient memory, so gated to N*C <= 32M entries.
    #   2. ONE packed-key sort (atom index in the low bits — no
    #      key/payload sort, no searchsorted, no inverse permutation; the
    #      original argsort pipeline measured 4.3 ms of the 11 ms force
    #      eval at 27k atoms).
    #   3. multi-million-atom stable key/payload sort fallback when the
    #      packed key would not fit i32.
    n = x.shape[0]
    if n * grid.n_cells <= 32 * 1024 * 1024:
        onehot = jax.nn.one_hot(cid, grid.n_cells, dtype=jnp.float32)
        cum = jnp.cumsum(onehot, axis=0)
        rank = jnp.take_along_axis(cum, cid[:, None], axis=1)[:, 0]
        rank = rank.astype(jnp.int32) - 1
        overflow = jnp.any(rank >= grid.capacity)
        rank = jnp.minimum(rank, grid.capacity - 1)
        slot = cid * grid.capacity + rank
        return slot, cid, overflow, xw
    shift = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    if grid.n_cells << shift < 2**31:
        # packed key fits i32 (27k atoms in 343 cells needs 24 bits)
        key = ((cid.astype(jnp.int32) << shift)
               | jnp.arange(n, dtype=jnp.int32))
        key_sorted = jax.lax.sort(key)
        cid_sorted = key_sorted >> shift
        atom_sorted = key_sorted & ((1 << shift) - 1)
    else:
        # multi-million-atom fallback: stable key/payload sort (i64
        # packing would silently truncate without jax_enable_x64)
        cid_sorted, atom_sorted = jax.lax.sort(
            (cid, jnp.arange(n, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
    # rank within each cid run: i - (start index of the run), run starts
    # found by a cummax of start positions (log-depth scan, no binary
    # search)
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), cid_sorted[1:] != cid_sorted[:-1]
    ])
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0)
    )
    rank_sorted = iota - first
    overflow = jnp.any(rank_sorted >= grid.capacity)
    rank_sorted = jnp.minimum(rank_sorted, grid.capacity - 1)
    slot_sorted = cid_sorted * grid.capacity + rank_sorted
    slot = jnp.zeros(n, jnp.int32).at[atom_sorted].set(slot_sorted)
    return slot, cid, overflow, xw


def _scaled_pair_list(system) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(idx (P, 2) i<j, se (P,), sl (P,)) for every pair with a scale
    below 1, built from the SPARSE exclusion lists — never materializes
    an (N, N) matrix (a 25k-atom box would need gigabytes)."""
    from .ff_params import SCEE, SCNB

    parts_idx, parts_se, parts_sl = [], [], []
    e12 = np.asarray(system.excl12_idx).reshape(-1, 2)
    if e12.size:
        e12 = np.sort(e12, axis=1)
        parts_idx.append(e12)
        parts_se.append(np.zeros(e12.shape[0], np.float32))
        parts_sl.append(np.zeros(e12.shape[0], np.float32))
    p14 = np.asarray(system.pair14_idx).reshape(-1, 2)
    if p14.size:
        p14 = np.sort(p14, axis=1)
        parts_idx.append(p14)
        parts_se.append(np.full(p14.shape[0], SCEE, np.float32))
        parts_sl.append(np.full(p14.shape[0], SCNB, np.float32))
    if not parts_idx:
        return (np.zeros((0, 2), np.int32), np.zeros(0, np.float32),
                np.zeros(0, np.float32))
    idx = np.concatenate(parts_idx).astype(np.int32)
    se = np.concatenate(parts_se)
    sl = np.concatenate(parts_sl)
    # dedupe (1-4 lists never overlap 1-2/1-3 by construction, but be safe)
    key = idx[:, 0].astype(np.int64) * (idx.max() + 1) + idx[:, 1]
    _, first = np.unique(key, return_index=True)
    return idx[first], se[first], sl[first]


def exclusion_band_width(system, cap: int = 64) -> int:
    """Smallest D covering the bulk of scaled/excluded pairs by index
    distance, capped (pairs beyond the cap go to the sparse list)."""
    idx, _, _ = _scaled_pair_list(system)
    if idx.shape[0] == 0:
        return 1
    dist = idx[:, 1] - idx[:, 0]
    return int(min(int(dist.max()), cap))


def banded_scales(
    system, D: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-offset scale arrays for the banded add-back pass plus the
    far-pair sparse correction list.

    Returns (band_se (N, D), band_sl (N, D), far_idx (P, 2), far_se,
    far_sl): band_se[i, k-1] = scale of pair (i, i+k) (1.0 when
    unscaled/past the end); ``far`` collects scaled pairs with index
    distance > D. Built entirely from the sparse lists: O(N*D) memory."""
    idx, se, sl = _scaled_pair_list(system)
    n = system.n_atoms
    band_se = np.ones((n, D), np.float32)
    band_sl = np.ones((n, D), np.float32)
    dist = idx[:, 1] - idx[:, 0] if idx.size else np.zeros(0, np.int64)
    near = dist <= D
    if idx.size:
        band_se[idx[near, 0], dist[near] - 1] = se[near]
        band_sl[idx[near, 0], dist[near] - 1] = sl[near]
    far_idx = idx[~near] if idx.size else np.zeros((0, 2), np.int32)
    far_se = se[~near] if idx.size else np.zeros(0, np.float32)
    far_sl = sl[~near] if idx.size else np.zeros(0, np.float32)
    return band_se, band_sl, far_idx.astype(np.int32), far_se, far_sl


def scatter_features(
    grid: CellGrid,
    xw: jax.Array,           # (N, 3) wrapped coordinates
    slot: jax.Array,         # (N,)
    charges: jax.Array,
    sigma: jax.Array,
    eps: jax.Array,
):
    """Scatter per-atom features into the (C_FEAT, S) slot array.
    Empty slots carry mask 0, atom index -1e6 (never within the
    exclusion band of a real index), and coordinates far outside the
    box so their distances never fall under the cutoff even against
    other padding."""
    S = grid.n_slots
    n = xw.shape[0]
    feat = jnp.stack([
        xw[:, 0], xw[:, 1], xw[:, 2],
        charges.astype(xw.dtype), sigma.astype(xw.dtype),
        eps.astype(xw.dtype), jnp.ones(n, xw.dtype),
        jnp.arange(n, dtype=xw.dtype),
    ], axis=1)                                            # (N, C)
    base = jnp.zeros((S, C_FEAT), xw.dtype)
    # park empty slots 100 box lengths away (any real-vs-empty or
    # empty-vs-empty distance then exceeds every cutoff)
    base = base.at[:, 0].set(-100.0 * grid.box[0])
    base = base.at[:, 7].set(-1e6)
    # unique_indices: slots are one-per-atom by construction (measured
    # ~11% off the scatter on TPU). A cell overflow CAN clamp two atoms
    # onto one slot — then the slot content is unspecified, but
    # bin_atoms' overflow flag already poisons the whole evaluation
    # loudly, so nothing downstream consumes it.
    slots = base.at[slot].set(feat, unique_indices=True)
    return slots.T                                        # (C, S)


def ghost_pad(grid: CellGrid, slots: jax.Array,
              box: jax.Array | None = None) -> jax.Array:
    """Wrap-pad the cell grid by one cell per face and shift the
    coordinate channels of the wrapped layers by +/- box so the kernel
    can use plain (non-minimum-image) distances.

    Input (C, S); output (C, Sg) with Sg = (nx+2)(ny+2)(nz+2)*capacity,
    flattened z-fastest then slot — every (gx, gy) column's z-extent is
    one contiguous run. ``box`` (traced) overrides the static box for
    the NPT path (see bin_atoms)."""
    C = slots.shape[0]
    g = slots.reshape(C, grid.nx, grid.ny, grid.nz, grid.capacity)
    g = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="wrap")
    if box is None:
        bx, by, bz = grid.box
    else:
        bx, by, bz = box[0], box[1], box[2]
    # shift coordinates of the wrapped boundary layers by the LATTICE
    # VECTOR of the crossed face: a = (ax, 0, 0), b = (tbx, by, 0),
    # c = (tcx, tcy, cz). Orthorhombic tilt components are zero, so the
    # extra adds vanish there; corner ghosts sit in several boundary
    # layers and accumulate each crossed vector, exactly as required.
    if grid.tilt is None:
        tbx = tcx = tcy = 0.0
    elif box is None:
        tbx, tcx, tcy = grid.tilt
    else:
        # traced box: tilt follows the diagonal via the static ratios
        from .box import tilt_ratios

        rbx, rcx, rcy = tilt_ratios(grid.box, grid.tilt)
        tbx, tcx, tcy = rbx * bx, rcx * bx, rcy * by
    g = g.at[0, 0, :, :, :].add(-bx)
    g = g.at[0, -1, :, :, :].add(bx)
    g = g.at[1, :, 0, :, :].add(-by)
    g = g.at[1, :, -1, :, :].add(by)
    g = g.at[2, :, :, 0, :].add(-bz)
    g = g.at[2, :, :, -1, :].add(bz)
    if grid.tilt is not None:
        g = g.at[0, :, 0, :, :].add(-tbx)      # b-vector x component
        g = g.at[0, :, -1, :, :].add(tbx)
        g = g.at[0, :, :, 0, :].add(-tcx)      # c-vector x component
        g = g.at[0, :, :, -1, :].add(tcx)
        g = g.at[1, :, :, 0, :].add(-tcy)      # c-vector y component
        g = g.at[1, :, :, -1, :].add(tcy)
    return g.reshape(C, -1)




@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborState:
    """Cell-assignment state for skin-amortized binning.

    The grid's cell edge exceeds the cutoff by a slack ("skin"); as long
    as every atom has moved less than skin/2 since the assignment was
    computed, any pair now within the cutoff was within cutoff + skin at
    binning time and therefore still lands in the 27-cell neighborhood —
    the assignment stays valid and the per-step sort/rank pass is
    skipped. Wrapped coordinates advance as ``xw_ref + (x - x_ref)``
    (raw displacement, no re-wrap), so an atom that drifts across the
    periodic boundary keeps coordinates consistent with its binned cell
    and the ghost shifts."""

    slot: jax.Array      # (N,) flat slot index per atom
    x_ref: jax.Array     # (N, 3) raw positions at the last rebin
    xw_ref: jax.Array    # (N, 3) wrapped positions at the last rebin
    overflow: jax.Array  # bool: a cell exceeded capacity at the rebin


def free_skin(grid: CellGrid) -> float:
    """Slack between the smallest cell edge and the cutoff — the skin
    the grid supports with ZERO extra kernel work."""
    return float(min(grid.cell_size) - grid.cutoff)


__all__ = [
    "C_FEAT", "CellGrid", "NeighborState", "make_cell_grid", "bin_atoms",
    "scatter_features", "ghost_pad", "exclusion_band_width",
    "banded_scales", "free_skin",
]
