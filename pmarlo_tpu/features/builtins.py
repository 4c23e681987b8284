"""Geometric feature kernels, all vmapped over frames on device.

Replaces mdtraj's C dihedral/distance/Rg routines (reference:
src/pmarlo/features/builtins.py:42-395 — PhiPsiFeature, Rg, chi1, contacts,
distances). Every function takes a trajectory tensor (T, N, 3) and static
index arrays, returning (T, K) feature matrices. Topology-aware index
derivation (phi/psi/chi1 quadruples) is host-side and static.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


# --- index derivation (host-side, static) ------------------------------------

def _atoms_by_residue(atom_names, residue_ids) -> dict:
    table: dict = {}
    for i, (name, rid) in enumerate(zip(atom_names, residue_ids)):
        table.setdefault(rid, {})[name] = i
    return table


def _residue_groups(atom_names, residue_ids, chain_ids=None):
    """[(rid, chain, {atom_name: index})] grouped by RUNS of equal
    (resid, chain) in atom order — a resid-keyed dict would merge
    residues from different chains that reuse the same numbering
    (homodimers commonly number every chain 1..N). ``chain_ids``
    (per-atom, optional) also lets dihedral derivation reject
    consecutive-resid neighbors that sit in DIFFERENT chains (continuous
    numbering across chains, common in consolidated exports); without
    it every group reports chain None and only resid continuity guards."""
    if chain_ids is None:
        chain_ids = [None] * len(residue_ids)
    groups: list = []
    prev = object()
    for i, (rid, ch, name) in enumerate(
        zip(residue_ids, chain_ids, atom_names)
    ):
        if (rid, ch) != prev:
            groups.append((int(rid), ch, {}))
            prev = (rid, ch)
        atoms = groups[-1][2]
        if name not in atoms:
            atoms[name] = i
    return groups


def phi_psi_indices(
    atom_names: Sequence[str], residue_ids: Sequence[int],
    chain_ids: Optional[Sequence[str]] = None,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """(phi_quads, psi_quads, residue_labels).

    phi_i = C(i-1)-N(i)-CA(i)-C(i);  psi_i = N(i)-CA(i)-C(i)-N(i+1).
    Residues missing backbone atoms (caps) are skipped. Neighbors must be
    true peptide predecessors/successors — consecutive resids in atom
    order AND (when per-atom ``chain_ids`` are given) the same chain; a
    resid jump (missing loop) or a wrap to a new chain never produces a
    dihedral across the gap. Without chain_ids, continuous numbering
    across chains cannot be told apart from one chain — pass them
    (TopologyInfo.from_topology does). DELIBERATE deviation from mdtraj:
    phi and psi are returned as PAIRS per interior residue (mdtraj
    computes them independently, keeping the first residue's psi and the
    last residue's phi); Ramachandran/bias consumers need the pairing.
    """
    groups = _residue_groups(atom_names, residue_ids, chain_ids)
    phi, psi, labels = [], [], []
    for g in range(1, len(groups)):
        rid, ch, res = groups[g]
        prev_rid, prev_ch, prev_res = groups[g - 1]
        if not all(a in res for a in ("N", "CA", "C")):
            continue
        if prev_rid != rid - 1 or prev_ch != ch or "C" not in prev_res:
            continue
        phi_quad = (prev_res["C"], res["N"], res["CA"], res["C"])
        if g + 1 >= len(groups):
            continue
        nxt_rid, nxt_ch, nxt_res = groups[g + 1]
        if nxt_rid != rid + 1 or nxt_ch != ch or "N" not in nxt_res:
            continue
        psi_quad = (res["N"], res["CA"], res["C"], nxt_res["N"])
        phi.append(phi_quad)
        psi.append(psi_quad)
        labels.append(rid)
    return (
        np.asarray(phi, dtype=np.int32).reshape(-1, 4),
        np.asarray(psi, dtype=np.int32).reshape(-1, 4),
        labels,
    )


def omega_indices(
    atom_names: Sequence[str], residue_ids: Sequence[int],
    chain_ids: Optional[Sequence[str]] = None,
) -> Tuple[np.ndarray, List[int]]:
    """omega_i = CA(i-1)-C(i-1)-N(i)-CA(i) peptide-bond dihedrals
    (consecutive-resid same-chain groups only — no dihedral across a
    chain break or missing-loop gap)."""
    groups = _residue_groups(atom_names, residue_ids, chain_ids)
    quads, labels = [], []
    for g in range(1, len(groups)):
        (prev_rid, prev_ch, a), (cur_rid, cur_ch, b) = groups[g - 1], groups[g]
        if cur_rid != prev_rid + 1 or cur_ch != prev_ch:
            continue
        prev_ca = a.get("CA", a.get("CH3"))
        cur_ca = b.get("CA", b.get("CH3"))
        if prev_ca is not None and "C" in a and "N" in b and cur_ca is not None:
            quads.append((prev_ca, a["C"], b["N"], cur_ca))
            labels.append(cur_rid)
    return np.asarray(quads, dtype=np.int32).reshape(-1, 4), labels


def chi1_indices(
    atom_names: Sequence[str],
    residue_names: Sequence[str],
    residue_ids: Sequence[int],
) -> Tuple[np.ndarray, List[int]]:
    """chi1 = N-CA-CB-*G quadruples for residues that have them
    (reference builtins.py:138)."""
    gamma_by_res = {
        "THR": "OG1", "SER": "OG", "CYS": "SG", "VAL": "CG1", "ILE": "CG1",
    }
    # residue name per GROUP (run of equal resid in atom order): a
    # resid-keyed dict would merge same-numbered residues across chains
    groups = _residue_groups(atom_names, residue_ids)
    quads, labels = [], []
    gnames = []
    prev = object()
    for rid, rn in zip(residue_ids, residue_names):
        if rid != prev:
            gnames.append(rn)
            prev = rid
    for (rid, _ch, res), rn in zip(groups, gnames):
        gamma = gamma_by_res.get(rn, "CG")
        if all(a in res for a in ("N", "CA", "CB")) and gamma in res:
            quads.append((res["N"], res["CA"], res["CB"], res[gamma]))
            labels.append(rid)
    return np.asarray(quads, dtype=np.int32).reshape(-1, 4), labels


def ca_pair_indices(
    atom_names: Sequence[str], residue_ids: Sequence[int], stride: int = 1
) -> np.ndarray:
    """All (strided) C-alpha pair indices (reference _features.py ca distances)."""
    cas = [i for i, n in enumerate(atom_names) if n == "CA"][::stride]
    pairs = [(a, b) for ai, a in enumerate(cas) for b in cas[ai + 1:]]
    return np.asarray(pairs, dtype=np.int32).reshape(-1, 2)


# --- device kernels -----------------------------------------------------------

def _dihedral_one_frame(frame: jax.Array, quads: jax.Array) -> jax.Array:
    p0, p1, p2, p3 = (frame[quads[:, i]] for i in range(4))
    b0, b1, b2 = p1 - p0, p2 - p1, p3 - p2
    n1 = jnp.cross(b0, b1)
    n2 = jnp.cross(b1, b2)
    b1n = b1 / jnp.sqrt(jnp.sum(b1 * b1, axis=-1, keepdims=True) + _EPS)
    # IUPAC/mdtraj sign: sin(phi) ~ (n1 x n2) . b1_hat. Note
    # (n1 x b1n) . n2 == -(n1 x n2) . b1n — the round-1 code used that
    # form and reported MIRRORED angles (regression: test_features.py::
    # test_dihedral_iupac_sign_convention).
    y = jnp.sum(jnp.cross(n1, n2) * b1n, axis=-1)
    return jnp.arctan2(y, jnp.sum(n1 * n2, axis=-1))


def as_frames(traj) -> jax.Array:
    """Promote (N, 3) -> (1, N, 3). NOT jnp.atleast_3d, which APPENDS the
    new axis ((N, 3) -> (N, 3, 1)) and would make a frame vmap iterate
    over atoms with silently-clamped index lookups."""
    traj = jnp.asarray(traj)
    if traj.ndim == 2:
        return traj[None]
    if traj.ndim != 3:
        raise ValueError(
            f"trajectory must be (T, N, 3) or (N, 3); got {traj.shape}"
        )
    return traj


def compute_dihedrals(traj: jax.Array, quads: "jax.Array | np.ndarray") -> jax.Array:
    """(T, N, 3), (M, 4) -> (T, M) signed dihedrals in (-pi, pi]."""
    quads = jnp.asarray(quads)
    return jax.vmap(lambda f: _dihedral_one_frame(f, quads))(as_frames(traj))


def compute_distances(traj: jax.Array, pairs: "jax.Array | np.ndarray") -> jax.Array:
    """(T, N, 3), (M, 2) -> (T, M) distances (nm)."""
    pairs = jnp.asarray(pairs)

    def one(frame):
        d = frame[pairs[:, 0]] - frame[pairs[:, 1]]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)

    return jax.vmap(one)(as_frames(traj))


def compute_angles(traj: jax.Array, triples: "jax.Array | np.ndarray") -> jax.Array:
    """(T, N, 3), (M, 3) -> (T, M) angles (rad)."""
    triples = jnp.asarray(triples)

    def one(frame):
        a, b, c = frame[triples[:, 0]], frame[triples[:, 1]], frame[triples[:, 2]]
        v1, v2 = a - b, c - b
        cos_t = jnp.sum(v1 * v2, axis=-1) / jnp.sqrt(
            jnp.sum(v1 * v1, axis=-1) * jnp.sum(v2 * v2, axis=-1) + _EPS
        )
        return jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))

    return jax.vmap(one)(as_frames(traj))


def radius_of_gyration(
    traj: jax.Array, masses: Optional[jax.Array] = None
) -> jax.Array:
    """(T, N, 3) -> (T,) mass-weighted Rg (reference builtins.py:89)."""
    if masses is None:
        w = jnp.ones(traj.shape[-2], dtype=traj.dtype)
    else:
        w = jnp.asarray(masses, dtype=traj.dtype)
    w = w / jnp.sum(w)

    def one(frame):
        com = jnp.sum(w[:, None] * frame, axis=0)
        d2 = jnp.sum((frame - com) ** 2, axis=-1)
        return jnp.sqrt(jnp.sum(w * d2))

    return jax.vmap(one)(traj)


def contacts(
    traj: jax.Array,
    pairs: "jax.Array | np.ndarray",
    cutoff_nm: float = 0.8,
    beta: float = 50.0,
) -> jax.Array:
    """Smooth contact indicator per pair: sigmoid((cutoff - r) * beta).

    Differentiable version of the reference's hard contact count
    (builtins.py contacts feature) — usable directly inside CV models.
    """
    r = compute_distances(traj, pairs)
    return jax.nn.sigmoid((cutoff_nm - r) * beta)


def align_to_reference(traj: jax.Array, reference: jax.Array) -> jax.Array:
    """Kabsch superposition of every frame onto a reference (T, N, 3).

    Replaces mdtraj's superpose (reference api/features.py:110
    align_trajectory). SVD per frame, vmapped.
    """
    ref = reference - jnp.mean(reference, axis=0, keepdims=True)

    def one(frame):
        x = frame - jnp.mean(frame, axis=0, keepdims=True)
        h = x.T @ ref
        u, _, vt = jnp.linalg.svd(h)
        d = jnp.sign(jnp.linalg.det(u @ vt))
        s = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=frame.dtype)).at[2, 2].set(d)
        rot = u @ s @ vt
        return x @ rot

    return jax.vmap(one)(traj)


def trig_expand_periodic(features: jax.Array) -> jax.Array:
    """Expand periodic features into (cos, sin) columns
    (reference api/features.py:138)."""
    return jnp.concatenate([jnp.cos(features), jnp.sin(features)], axis=-1)


__all__ = [
    "phi_psi_indices",
    "chi1_indices",
    "ca_pair_indices",
    "compute_dihedrals",
    "compute_distances",
    "compute_angles",
    "radius_of_gyration",
    "contacts",
    "align_to_reference",
    "trig_expand_periodic",
]
