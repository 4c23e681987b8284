"""Structural features: SASA, hydrogen bonds, secondary-structure fractions.

Replaces the mdtraj-backed structural features of the reference
(src/pmarlo/features/builtins.py:171 SASAFeature (Shrake-Rupley), :219
SecondaryStructureFractionFeature (DSSP), hydrogen-bond counting
(Baker-Hubbard)) with JAX kernels:

- SASA: Shrake-Rupley sphere sampling exactly (golden-spiral point set,
  batched over frames/atoms on device — the algorithm is embarrassingly
  TPU-parallel).
- H-bonds: geometric donor-acceptor criterion (distance + angle), smooth
  (sigmoid) or hard counting.
- Secondary structure: phi/psi-region classification (alpha/beta/coil) —
  a documented simplification of DSSP (no H-bond energy term); fractions
  per frame match DSSP closely on well-formed structures.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Feature, TopologyInfo, register_feature
from .builtins import as_frames, compute_dihedrals, phi_psi_indices

_EPS = 1e-12

# van der Waals radii (nm) by element for SASA
_VDW_RADII = {"H": 0.120, "C": 0.170, "N": 0.155, "O": 0.152, "S": 0.180}
_PROBE_RADIUS = 0.14  # nm (water)


# canonical single-frame promotion lives in builtins (shared trap note)
_as_frames = as_frames


def _element_of(name: str, fallback: str = "C") -> str:
    """Element guess from a PDB atom name (single shared heuristic —
    SASA radii lookup and H-bond donor/acceptor typing must agree)."""
    stripped = name.lstrip("0123456789")
    return (stripped[:1] or fallback).upper()


def _golden_spiral_points(n: int) -> np.ndarray:
    """n approximately-uniform points on the unit sphere."""
    idx = np.arange(n) + 0.5
    phi = np.arccos(1.0 - 2.0 * idx / n)
    theta = np.pi * (1.0 + 5**0.5) * idx
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=1,
    )


def shrake_rupley_sasa(
    traj: jax.Array,
    radii_nm: "np.ndarray | Sequence[float]",
    n_points: int = 96,
) -> jax.Array:
    """Per-atom SASA (nm^2) for every frame: (T, N, 3) -> (T, N).

    For each atom, sample ``n_points`` on its solvent-expanded sphere and
    count points not buried inside any neighbor's sphere. Fully batched:
    the occlusion test is one (N, P, N) distance comparison per frame.
    """
    sphere = jnp.asarray(_golden_spiral_points(n_points), dtype=jnp.float32)
    radii = jnp.asarray(np.asarray(radii_nm), dtype=jnp.float32) + _PROBE_RADIUS

    def one_frame(x):
        # sample points: (N, P, 3)
        pts = x[:, None, :] + radii[:, None, None] * sphere[None, :, :]
        # distance of every point to every atom center: (N, P, N)
        d2 = jnp.sum(
            (pts[:, :, None, :] - x[None, None, :, :]) ** 2, axis=-1
        )
        inside = d2 < (radii[None, None, :] ** 2 - 1e-10)
        # a point on atom i's sphere is inside atom i itself numerically;
        # mask self-occlusion
        self_mask = jnp.eye(x.shape[0], dtype=bool)[:, None, :]
        inside = jnp.where(self_mask, False, inside)
        buried = jnp.any(inside, axis=-1)           # (N, P)
        frac = 1.0 - jnp.mean(buried.astype(jnp.float32), axis=-1)
        return 4.0 * jnp.pi * radii**2 * frac

    return jax.vmap(one_frame)(_as_frames(traj))


def hydrogen_bonds(
    traj: jax.Array,
    donors: np.ndarray,       # (D, 2) [heavy, H] atom indices
    acceptors: np.ndarray,    # (A,) acceptor atom indices
    *,
    distance_cutoff_nm: float = 0.25,
    angle_cutoff_deg: float = 120.0,
    smooth: bool = False,
) -> jax.Array:
    """H-bond count per frame by the geometric criterion: H..A distance
    below cutoff and D-H..A angle above cutoff (Baker-Hubbard-style).

    Excludes pairs where the acceptor is the donor heavy atom.
    """
    donors = jnp.asarray(donors)
    acceptors = jnp.asarray(acceptors)
    cos_cut = jnp.cos(jnp.deg2rad(angle_cutoff_deg))

    def one_frame(x):
        d_heavy = x[donors[:, 0]]       # (D, 3)
        d_h = x[donors[:, 1]]
        acc = x[acceptors]              # (A, 3)
        ha = acc[None, :, :] - d_h[:, None, :]           # (D, A, 3)
        dist = jnp.sqrt(jnp.sum(ha * ha, axis=-1) + _EPS)
        hd = d_heavy - d_h                               # (D, 3)
        hd_n = hd / jnp.sqrt(jnp.sum(hd * hd, axis=-1, keepdims=True) + _EPS)
        ha_n = ha / dist[..., None]
        # cos of the D-H..A angle at the hydrogen: linear bond -> -1
        cos_angle = jnp.sum(hd_n[:, None, :] * ha_n, axis=-1)
        # exclude self (acceptor == donor heavy)
        same = donors[:, 0][:, None] == acceptors[None, :]
        if smooth:
            ind = (
                jax.nn.sigmoid((distance_cutoff_nm - dist) * 100.0)
                * jax.nn.sigmoid((cos_cut - cos_angle) * 20.0)
            )
            ind = jnp.where(same, 0.0, ind)
            return jnp.sum(ind)
        hit = (dist < distance_cutoff_nm) & (cos_angle < cos_cut) & ~same
        return jnp.sum(hit.astype(jnp.float32))

    return jax.vmap(one_frame)(_as_frames(traj))


def find_donors_acceptors(
    atom_names: Sequence[str],
    elements: Sequence[str],
    bonds: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Protein donors (N-H, O-H, S-H pairs) and acceptors (O, N with lone
    pairs approximated as all O plus amide-free N)."""
    neighbors = {}
    for a, b in np.asarray(bonds):
        neighbors.setdefault(int(a), []).append(int(b))
        neighbors.setdefault(int(b), []).append(int(a))
    donors = []
    for i, el in enumerate(elements):
        if el != "H":
            continue
        heavy = neighbors.get(i, [None])[0]
        if heavy is not None and elements[heavy] in ("N", "O", "S"):
            donors.append((heavy, i))
    acceptors = []
    for i, el in enumerate(elements):
        if el == "O":
            acceptors.append(i)
        elif el == "N":
            # lone-pair nitrogens: no bonded hydrogen and at most two
            # heavy neighbors (His ND1/NE2 in their unprotonated
            # tautomer); amide/ammonium N (backbone, LYS NZ, ARG NH*)
            # carry H or a delocalized lone pair and do not accept
            nbrs = neighbors.get(i, [])
            if len(nbrs) <= 2 and not any(elements[j] == "H" for j in nbrs):
                acceptors.append(i)
    return (
        np.asarray(donors, dtype=np.int32).reshape(-1, 2),
        np.asarray(acceptors, dtype=np.int32),
    )


# --- secondary structure from phi/psi regions -------------------------------------

def ss_fractions(
    traj: jax.Array, top: TopologyInfo
) -> jax.Array:
    """(T, 3) fractions of (alpha, beta, coil) residues per frame.

    phi/psi-region classification (alpha: phi in [-160, -20], psi in
    [-120, 50]; beta: phi in [-180, -45], psi in [90, 180] or [-180, -150]).
    A documented simplification of DSSP (reference builtins.py:219 uses
    mdtraj's DSSP; this geometric rule has no H-bond energy term).
    """
    phi_q, psi_q, _ = phi_psi_indices(top.atom_names, top.residue_ids, top.chain_ids)
    if phi_q.shape[0] == 0:
        raise ValueError("no phi/psi dihedrals for secondary structure")
    phi = jnp.rad2deg(compute_dihedrals(traj, phi_q))
    psi = jnp.rad2deg(compute_dihedrals(traj, psi_q))
    alpha = (
        (phi >= -160.0) & (phi <= -20.0) & (psi >= -120.0) & (psi <= 50.0)
    )
    beta = (
        (phi >= -180.0) & (phi <= -45.0)
        & ((psi >= 90.0) | (psi <= -150.0))
        & ~alpha
    )
    coil = ~alpha & ~beta
    stack = jnp.stack([alpha, beta, coil], axis=-1).astype(jnp.float32)
    return jnp.mean(stack, axis=1)


# --- Kabsch-Sander DSSP (reference builtins.py:219 uses mdtraj's DSSP) -----

#: K&S electrostatic H-bond model: E = q1 q2 f (1/rON + 1/rCH - 1/rOH
#: - 1/rCN) with q1 q2 f = 27.888 kcal/mol*A; bond when E < -0.5 kcal/mol
_KS_COUPLING_KCAL_A = 27.888
_KS_CUTOFF_KCAL = -0.5
_NH_BOND_NM = 0.101


def _backbone_indices(
    top: TopologyInfo,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(R, 4) [N, CA, C, O] indices per residue (-1 where missing) and the
    (R,) index of the amide H (-1 when absent — synthesized from the
    previous C=O direction, the standard DSSP reconstruction).

    Residues are grouped SEQUENTIALLY by runs of equal (residue id,
    chain) in atom order — not by a resid-keyed dict, which would merge
    residues from different chains that reuse the same numbering
    (homodimers commonly number every chain 1..N). The returned chain
    array (group-level) lets contiguity tests reject consecutive resids
    that sit in different chains (continuous numbering across chains)."""
    chains = top.chain_ids if top.chain_ids is not None else (
        [None] * len(top.residue_ids)
    )
    groups: list = []
    prev_key = object()
    for i, (rid, ch, name, rn) in enumerate(zip(
        top.residue_ids, chains, top.atom_names, top.residue_names
    )):
        if (rid, ch) != prev_key:
            groups.append((rid, ch, rn, {}))
            prev_key = (rid, ch)
        atoms = groups[-1][3]
        if name in ("N", "CA", "C", "O", "H", "HN") and name not in atoms:
            atoms[name] = i
    bb = np.full((len(groups), 4), -1, np.int64)
    hh = np.full(len(groups), -1, np.int64)
    resnames, rids, gchains = [], [], []
    for r, (rid, ch, rn, atoms) in enumerate(groups):
        for c, name in enumerate(("N", "CA", "C", "O")):
            bb[r, c] = atoms.get(name, -1)
        hh[r] = atoms.get("H", atoms.get("HN", -1))
        resnames.append(rn)
        rids.append(int(rid))
        gchains.append(ch)
    return (bb, hh, np.asarray(resnames), np.asarray(rids, np.int64),
            gchains)


def kabsch_sander_hbonds(
    traj: jax.Array, top: TopologyInfo
) -> Tuple[jax.Array, np.ndarray]:
    """(T, R, R) boolean: HB[t, i, j] = C=O of residue i accepts a
    backbone H-bond from N-H of residue j (K&S energy < -0.5 kcal/mol).

    The amide H is taken from the structure when present, otherwise
    placed 1.01 A from N along the previous peptide's C->O... C=O
    direction (h = n + 0.101 nm * unit(c_prev - o_prev)), exactly the
    Kabsch-Sander reconstruction. Prolines and chain starts never
    donate."""
    bb, hh, resnames, rids, gchains = _backbone_indices(top)
    R = bb.shape[0]
    valid = (bb >= 0).all(axis=1)
    # donors without an explicit H need the previous residue's C/O for H
    # synthesis — and that previous residue must actually be the peptide
    # predecessor: consecutive resids in the same chain. A resid jump
    # (missing loop) or a wrap to a new chain (homodimers renumber from
    # 1) means the adjacent GROUP is an unrelated residue whose C=O
    # direction must not place this residue's amide H.
    has_h = hh >= 0
    contig = np.zeros(R, bool)
    contig[1:] = (rids[1:] == rids[:-1] + 1) & np.asarray(
        [gchains[r] == gchains[r - 1] for r in range(1, R)], bool
    )
    prev_ok = np.zeros(R, bool)
    prev_ok[1:] = valid[:-1]
    prev_ok &= contig
    can_donate = valid & (resnames != "PRO") & (has_h | prev_ok)

    safe_bb = np.where(bb >= 0, bb, 0)
    safe_h = np.where(hh >= 0, hh, 0)
    bb_j = jnp.asarray(safe_bb)
    hh_j = jnp.asarray(safe_h)
    has_h_j = jnp.asarray(has_h)
    valid_j = jnp.asarray(valid)
    donate_j = jnp.asarray(can_donate)
    # contiguous-run id per residue group (chain/gap breaks start a run)
    run_j = jnp.asarray(np.cumsum(~contig))

    def one_frame(x):
        n = x[bb_j[:, 0]]
        c = x[bb_j[:, 2]]
        o = x[bb_j[:, 3]]
        # synthesized H: previous residue's C=O direction
        co_prev = jnp.roll(c, 1, axis=0) - jnp.roll(o, 1, axis=0)
        co_prev = co_prev / (jnp.linalg.norm(co_prev, axis=1,
                                             keepdims=True) + _EPS)
        h_syn = n + _NH_BOND_NM * co_prev
        h = jnp.where(has_h_j[:, None], x[hh_j], h_syn)

        def inv_dist(a, b):
            d = a[None, :, :] - b[:, None, :]     # (i=acceptor, j=donor)
            return 1.0 / (10.0 * jnp.sqrt(jnp.sum(d * d, axis=-1)) + _EPS)

        # E[i, j]: CO of i (acceptor) with NH of j (donor); distances in A
        e = _KS_COUPLING_KCAL_A * (
            inv_dist(n, o) + inv_dist(h, c) - inv_dist(h, o) - inv_dist(n, c)
        )
        hb = e < _KS_CUTOFF_KCAL
        mask = (valid_j[:, None] & donate_j[None, :])
        # |i-j| < 2 exclusion applies to SEQUENCE neighbors only: two
        # group-adjacent residues across a chain break (different run)
        # may legitimately H-bond
        ij = jnp.arange(R)
        near = (jnp.abs(ij[:, None] - ij[None, :]) < 2) & (
            run_j[:, None] == run_j[None, :]
        )
        return hb & mask & ~near

    return jax.vmap(one_frame)(_as_frames(traj)), resnames


def dssp(traj: jax.Array, top: TopologyInfo) -> jax.Array:
    """(T, R) simplified DSSP codes per residue: 0 = coil, 1 = helix
    (H/G/I), 2 = strand (E/B) — mdtraj's ``dssp(simplified=True)``
    classes, computed from Kabsch-Sander backbone H-bond energies.

    Patterns (Kabsch & Sander 1983):
    * n-turn(i) = HB(i, i+n), n in {3, 4, 5}; two consecutive n-turns
      make a helix over the spanned residues (all map to 'H' in the
      simplified alphabet);
    * parallel bridge(i, j): HB(i-1, j) & HB(j, i+1) or HB(j-1, i) &
      HB(i, j+1); antiparallel: HB(i, j) & HB(j, i) or HB(i-1, j+1) &
      HB(j-1, i+1); bridged residues are strand.
    Priority: 4-helix > strand > 3/5-helix (the DSSP override order
    collapsed to the simplified alphabet)."""
    hb, _ = kabsch_sander_hbonds(traj, top)
    T, R, _ = hb.shape

    def shift(m, di, dj):
        """m[i + di, j + dj] with False padding."""
        return jnp.roll(jnp.roll(m, -di, axis=1), -dj, axis=2) & _edge_ok(
            R, di, dj
        )

    def _edge_ok(R_, di, dj):
        i = jnp.arange(R_)
        oki = (i + di >= 0) & (i + di < R_)
        okj = (i + dj >= 0) & (i + dj < R_)
        return oki[:, None] & okj[None, :]

    ij = jnp.arange(R)
    diag = ij[None, :] - ij[:, None]             # j - i

    def turn(n):
        # turn_n[t, i] = HB[t, i, i + n]
        sel = diag == n
        return jnp.any(hb & sel[None], axis=2)

    t3, t4, t5 = turn(3), turn(4), turn(5)

    def helix_from_turns(t, n):
        # consecutive turns at i-1 and i mark residues i .. i+n-1
        start = jnp.pad(t[:, :-1] & t[:, 1:], ((0, 0), (1, 0)))
        m = jnp.zeros_like(start)
        for k in range(n):
            m = m | jnp.roll(start, k, axis=1) & (
                jnp.arange(R)[None, :] >= k
            )
        return m

    helix4 = helix_from_turns(t4, 4)
    helix3 = helix_from_turns(t3, 3)
    helix5 = helix_from_turns(t5, 5)

    far = jnp.abs(diag) >= 3
    hbT = hb.swapaxes(1, 2)                       # hbT[i, j] = HB(j, i)
    # parallel: HB(i-1, j) & HB(j, i+1)  or  HB(j-1, i) & HB(i, j+1)
    par = (shift(hb, -1, 0) & shift(hbT, 1, 0)) | (
        shift(hbT, 0, -1) & shift(hb, 0, 1)
    )
    # antiparallel: HB(i, j) & HB(j, i)  or  HB(i-1, j+1) & HB(j-1, i+1)
    anti = (hb & hbT) | (shift(hb, -1, 1) & shift(hbT, 1, -1))
    bridge = jnp.any((par | anti) & far[None], axis=2)

    strand = bridge & ~helix4
    helix = helix4 | ((helix3 | helix5) & ~strand)
    return jnp.where(helix, 1, jnp.where(strand, 2, 0)).astype(jnp.int8)


def ss_fractions_dssp(traj: jax.Array, top: TopologyInfo) -> jax.Array:
    """(T, 3) fractions of (helix, strand, coil) residues per frame from
    the Kabsch-Sander DSSP assignment (reference parity path; the
    phi/psi heuristic ``ss_fractions`` remains as the fast path)."""
    codes = dssp(traj, top)
    h = jnp.mean((codes == 1).astype(jnp.float32), axis=1)
    e = jnp.mean((codes == 2).astype(jnp.float32), axis=1)
    return jnp.stack([h, e, 1.0 - h - e], axis=1)


def baker_hubbard(
    traj: jax.Array,
    top: TopologyInfo,
    *,
    freq: float = 0.1,
    distance_cutoff_nm: float = 0.25,
    angle_cutoff_deg: float = 120.0,
) -> np.ndarray:
    """Identify hydrogen bonds present in >= ``freq`` of frames
    (mdtraj.baker_hubbard semantics: H..A < 2.5 A and D-H..A > 120 deg).
    Returns (K, 3) [donor-heavy, H, acceptor] index triplets.

    The per-frame criterion is the same geometric test as
    :func:`hydrogen_bonds`; this adds the occupancy filter over the
    trajectory that defines the Baker-Hubbard method."""
    if top.bonds is None:
        raise ValueError("baker_hubbard needs topology bonds")
    donors, acceptors = find_donors_acceptors(
        top.atom_names, [ _element_of(n) for n in top.atom_names ], top.bonds
    )
    if donors.shape[0] == 0 or acceptors.shape[0] == 0:
        return np.zeros((0, 3), np.int64)
    donors_j = jnp.asarray(donors)
    acceptors_j = jnp.asarray(acceptors)
    cos_cut = jnp.cos(jnp.deg2rad(angle_cutoff_deg))

    def one_frame(x):
        d_heavy = x[donors_j[:, 0]]
        d_h = x[donors_j[:, 1]]
        acc = x[acceptors_j]
        ha = acc[None, :, :] - d_h[:, None, :]
        dist = jnp.sqrt(jnp.sum(ha * ha, axis=-1) + _EPS)
        hd = d_heavy - d_h
        hd_n = hd / jnp.sqrt(jnp.sum(hd * hd, axis=-1, keepdims=True) + _EPS)
        ha_n = ha / dist[..., None]
        cos_angle = jnp.sum(hd_n[:, None, :] * ha_n, axis=-1)
        same = donors_j[:, 0][:, None] == acceptors_j[None, :]
        return (dist < distance_cutoff_nm) & (cos_angle < cos_cut) & ~same

    present = jax.vmap(one_frame)(_as_frames(traj))
    occupancy = np.asarray(jnp.mean(present.astype(jnp.float32), axis=0))
    di, ai = np.where(occupancy >= freq)
    return np.stack([
        donors[di, 0], donors[di, 1], np.asarray(acceptors)[ai]
    ], axis=1).astype(np.int64)


# --- registry entries ------------------------------------------------------------

@register_feature("sasa")
class SASAFeature(Feature):
    """Total SASA per frame (reference builtins.py:171)."""

    name = "sasa"

    def __call__(self, traj, top: TopologyInfo):
        radii = np.asarray([
            _VDW_RADII.get(self._element(n), 0.17) for n in top.atom_names
        ])
        return jnp.sum(shrake_rupley_sasa(traj, radii), axis=1, keepdims=True)

    @staticmethod
    def _element(name: str) -> str:
        stripped = name.lstrip("0123456789")
        return stripped[0].upper() if stripped else "C"

    def n_outputs(self, top: TopologyInfo) -> int:
        return 1


@register_feature("hbonds")
class HBondFeature(Feature):
    """H-bond count per frame (reference builtins.py Baker-Hubbard)."""

    name = "hbonds"

    def __call__(self, traj, top: TopologyInfo):
        bonds = getattr(top, "bonds", None)
        if bonds is None:
            raise ValueError(
                "hbonds feature needs TopologyInfo with a 'bonds' attribute"
            )
        elements = [SASAFeature._element(n) for n in top.atom_names]
        donors, acceptors = find_donors_acceptors(top.atom_names, elements, bonds)
        if donors.shape[0] == 0 or acceptors.shape[0] == 0:
            raise ValueError("no donors/acceptors found")
        return hydrogen_bonds(traj, donors, acceptors)[:, None]

    def n_outputs(self, top: TopologyInfo) -> int:
        return 1


@register_feature("ssfrac")
class SecondaryStructureFractionFeature(Feature):
    """(alpha, beta, coil) fractions (reference builtins.py:219)."""

    name = "ssfrac"

    def __call__(self, traj, top: TopologyInfo):
        return ss_fractions(traj, top)

    def n_outputs(self, top: TopologyInfo) -> int:
        return 3


__all__ = [
    "shrake_rupley_sasa",
    "hydrogen_bonds",
    "find_donors_acceptors",
    "ss_fractions",
    "SASAFeature",
    "HBondFeature",
    "SecondaryStructureFractionFeature",
]
