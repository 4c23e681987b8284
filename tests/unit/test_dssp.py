"""Kabsch-Sander DSSP + Baker-Hubbard validation (VERDICT r2 item #8).

Oracles (mdtraj is not in this image, so fixtures cannot be generated
from it): (a) an ideal alpha-helix built from internal coordinates must
assign helix; (b) the 3gd8 crystal structure's own HELIX records — the
crystallographers' annotation — must agree with our assignment on the
annotated residues."""

import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp

from pmarlo_tpu.features.base import TopologyInfo
from pmarlo_tpu.features.structure import (
    baker_hubbard,
    dssp,
    kabsch_sander_hbonds,
    ss_fractions_dssp,
)

GD8 = Path("/root/reference/tests/_assets/3gd8.pdb")


def _nerf(a, b, c, bond, angle_deg, torsion_deg):
    """Place atom d: |cd| = bond, angle(b,c,d), torsion(a,b,c,d)."""
    angle = np.deg2rad(angle_deg)
    torsion = np.deg2rad(torsion_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    n = np.cross(b - a, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d2 = np.array([
        -bond * np.cos(angle),
        bond * np.sin(angle) * np.cos(torsion),
        bond * np.sin(angle) * np.sin(torsion),
    ])
    return c + d2[0] * bc + d2[1] * m + d2[2] * n


def _ideal_backbone(n_res, phi=-57.0, psi=-47.0, omega=180.0):
    """Poly-ALA backbone (N, CA, C, O per residue) in nm from ideal
    internal coordinates."""
    N = [np.array([0.0, 0.0, 0.0])]
    CA = [np.array([1.458, 0.0, 0.0])]
    C = [_nerf(np.array([0.0, 1.0, 0.0]), N[0], CA[0], 1.525, 111.2, 60.0)]
    O = []
    for i in range(n_res - 1):
        n_next = _nerf(N[i], CA[i], C[i], 1.329, 116.2, psi)
        O.append(_nerf(N[i], CA[i], C[i], 1.231, 120.5, psi + 180.0))
        ca_next = _nerf(CA[i], C[i], n_next, 1.458, 121.7, omega)
        c_next = _nerf(C[i], n_next, ca_next, 1.525, 111.2, phi)
        N.append(n_next)
        CA.append(ca_next)
        C.append(c_next)
    O.append(_nerf(N[-1], CA[-1], C[-1], 1.231, 120.5, psi + 180.0))
    coords, names, rids = [], [], []
    for i in range(n_res):
        for nm, p in (("N", N[i]), ("CA", CA[i]), ("C", C[i]), ("O", O[i])):
            coords.append(p / 10.0)  # A -> nm
            names.append(nm)
            rids.append(i + 1)
    top = TopologyInfo(
        atom_names=names, residue_names=["ALA"] * len(names),
        residue_ids=rids,
    )
    return np.asarray(coords, np.float32), top


def test_ideal_helix_is_helix():
    x, top = _ideal_backbone(16, phi=-57.0, psi=-47.0)
    codes = np.asarray(dssp(jnp.asarray(x)[None], top))[0]
    interior = codes[2:-2]
    assert (interior == 1).mean() > 0.7, codes
    assert (codes == 2).sum() == 0


def test_extended_strand_is_not_helix():
    x, top = _ideal_backbone(12, phi=-139.0, psi=135.0)
    codes = np.asarray(dssp(jnp.asarray(x)[None], top))[0]
    # a single isolated strand has no bridge partner: no helix, no E
    assert (codes == 1).sum() == 0


def test_ks_hbond_pattern_ideal_helix():
    """The alpha-helix's defining i -> i+4 backbone H-bond ladder."""
    x, top = _ideal_backbone(12)
    hb, _ = kabsch_sander_hbonds(jnp.asarray(x)[None], top)
    hb = np.asarray(hb)[0]
    ij = np.arange(hb.shape[0])
    four = hb[ij[:-4], ij[:-4] + 4]
    assert four[1:-1].mean() > 0.7, np.argwhere(hb)


@pytest.mark.slow
def test_3gd8_matches_crystal_annotation():
    """>= 60% of the residues the crystallographers annotated as HELIX
    must be assigned helix by our DSSP on the deposited coordinates."""
    if not GD8.exists():
        pytest.skip("3gd8 not mounted")
    from pmarlo_tpu.io.pdb import read_pdb

    helix_ranges = []
    for line in GD8.read_text().splitlines():
        if line.startswith("HELIX"):
            helix_ranges.append((int(line[21:25]), int(line[33:37])))
    assert helix_ranges
    s = read_pdb(GD8)
    names, rids, rnames, coords = [], [], [], []
    for r in s.residues:
        for a in r.atoms:
            names.append(a.name)
            rids.append(r.resid)
            rnames.append(r.name)
            coords.append(a.xyz)
    top = TopologyInfo(atom_names=names, residue_names=rnames,
                       residue_ids=rids)
    x = jnp.asarray(np.asarray(coords, np.float32))[None]
    codes = np.asarray(dssp(x, top))[0]
    # map residue order -> resid
    order = []
    for rid in rids:
        if rid not in order:
            order.append(rid)
    code_of = dict(zip(order, codes))
    annotated = [rid for lo, hi in helix_ranges for rid in range(lo, hi + 1)
                 if rid in code_of]
    agree = np.mean([code_of[rid] == 1 for rid in annotated])
    assert agree >= 0.6, f"only {agree:.0%} of annotated helix residues are H"
    # helix fraction overall should be substantial but not everything
    frac = np.asarray(ss_fractions_dssp(x, top))[0]
    assert 0.3 < frac[0] < 0.95
    assert frac[2] > 0.03        # some coil exists


def test_baker_hubbard_occupancy():
    """Bond present in 1 of 2 frames: freq=0.4 finds it, freq=0.6 not."""
    # donor O-H ... acceptor O, ideal geometry in frame 0, broken in 1
    names = ["O", "H1", "O"]
    bonds = np.asarray([[0, 1]])
    top = TopologyInfo(atom_names=names, residue_names=["HOH"] * 3,
                       residue_ids=[1, 1, 2], bonds=bonds)
    good = np.asarray([
        [0.0, 0.0, 0.0],       # donor heavy
        [0.097, 0.0, 0.0],     # H
        [0.29, 0.0, 0.0],      # acceptor at 0.193 nm from H, linear
    ], np.float32)
    bad = good.copy()
    bad[2, 0] = 1.5
    traj = jnp.asarray(np.stack([good, bad]))
    found = baker_hubbard(traj, top, freq=0.4)
    assert found.shape[0] == 1 and tuple(found[0]) == (0, 1, 2)
    assert baker_hubbard(traj, top, freq=0.6).shape[0] == 0


def test_dssp_multichain_duplicate_resids():
    """Two chains numbered identically must NOT merge: a homodimer of
    two ideal helices yields 2x the residues, both helical (code-review
    r3 finding: resid-keyed grouping dropped all but the first chain)."""
    x1, top1 = _ideal_backbone(12)
    # second copy translated far away, SAME residue numbering
    x2 = x1 + np.asarray([5.0, 0.0, 0.0], np.float32)
    names = list(top1.atom_names) * 2
    rids = list(top1.residue_ids) * 2
    rnames = list(top1.residue_names) * 2
    top = TopologyInfo(atom_names=names, residue_names=rnames,
                       residue_ids=rids)
    x = np.concatenate([x1, x2])
    codes = np.asarray(dssp(jnp.asarray(x)[None], top))[0]
    assert codes.shape[0] == 24          # both chains present
    assert (codes[2:10] == 1).mean() > 0.7
    assert (codes[14:22] == 1).mean() > 0.7
