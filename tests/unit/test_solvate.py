"""Solvation and nonstandard-residue replacement (reference
protein/protein.py:345-348, :366-372 via PDBFixer)."""

import copy
import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.io.pdb import read_pdb
from pmarlo_tpu.protein.nonstandard import replace_nonstandard
from pmarlo_tpu.protein.protein import Protein
from pmarlo_tpu.protein.solvate import (
    solvate_structure,
    structure_formal_charge,
)

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")

pytestmark = pytest.mark.skipif(
    not CHIGNOLIN.exists(), reason="chignolin test asset not mounted"
)


@pytest.fixture(scope="module")
def chignolin():
    return read_pdb(CHIGNOLIN)


def test_formal_charge(chignolin):
    # GYDPETGTWG: ASP + GLU = -2; free termini cancel
    assert structure_formal_charge(chignolin) == -2


def test_solvate_box_and_neutrality(chignolin):
    solvated, box = solvate_structure(chignolin, padding=1.0)
    coords = chignolin.coordinates()
    extent = coords.max(axis=0) - coords.min(axis=0)
    for b, e in zip(box, extent):
        assert abs(b - (e + 2.0)) < 1e-9  # padding on both faces

    names = [r.name for r in solvated.residues]
    n_w, n_na, n_cl = names.count("HOH"), names.count("NA"), names.count("CL")
    assert n_na == 2 and n_cl == 0  # neutralizes the -2
    # density: within 20% of liquid water over the accessible volume
    vol = float(np.prod(box))
    assert 0.6 * 33.37 < n_w / vol < 1.05 * 33.37

    # exclusion: no water O within 0.26 nm of the protein
    prot = np.array([
        a.xyz for r in solvated.residues for a in r.atoms
        if r.name not in ("HOH", "NA", "CL")
    ])
    wo = np.array([
        a.xyz for r in solvated.residues if r.name == "HOH"
        for a in r.atoms if a.name == "O"
    ])
    dmin = np.sqrt(((wo[:, None] - prot[None]) ** 2).sum(-1)).min()
    assert dmin > 0.26

    # TIP3P geometry on every water
    for r in solvated.residues[-5:]:
        if r.name != "HOH":
            continue
        pos = {a.name: np.asarray(a.xyz) for a in r.atoms}
        assert abs(np.linalg.norm(pos["H1"] - pos["O"]) - 0.09572) < 1e-6
        assert abs(np.linalg.norm(pos["H2"] - pos["O"]) - 0.09572) < 1e-6


def test_solvate_deterministic(chignolin):
    a, _ = solvate_structure(chignolin, padding=0.8, seed=7)
    b, _ = solvate_structure(chignolin, padding=0.8, seed=7)
    assert a.n_atoms == b.n_atoms
    np.testing.assert_allclose(a.coordinates(), b.coordinates())


def test_prepare_solvate_end_to_end(chignolin):
    p = Protein(copy.deepcopy(chignolin)).prepare(
        solvate=True, solvent_padding=0.8
    )
    assert p.box is not None
    names = [r.name for r in p.structure.residues]
    assert names.count("HOH") > 100
    # MD topology stays protein-only (implicit-solvent engine)
    assert p.topology.n_atoms == 138

    out = p.save_structure("/tmp/_pmarlo_test_solv.pdb")
    text = Path(out).read_text()
    assert text.startswith("CRYST1")
    rt = read_pdb(out)
    assert rt.n_atoms == p.structure.n_atoms


def test_solvate_skipped_when_waters_present(chignolin):
    p1 = Protein(copy.deepcopy(chignolin)).prepare(
        solvate=True, solvent_padding=0.8
    )
    # prepare again with waters kept: solvate must be a no-op
    p2 = Protein(p1.structure).prepare(
        solvate=True, keep_waters=True, add_missing_atoms=False,
        add_missing_hydrogens=False,
    )
    n1 = sum(1 for r in p1.structure.residues if r.name == "HOH")
    n2 = sum(1 for r in p2.structure.residues if r.name == "HOH")
    assert n1 == n2


def test_replace_nonstandard_mse(chignolin):
    s = copy.deepcopy(chignolin)
    # forge an MSE out of a residue by renaming (structure-level check)
    import dataclasses

    r = s.residues[4]
    r.name = "MSE"
    r.atoms = [dataclasses.replace(a, resname="MSE") for a in r.atoms]
    out = replace_nonstandard(s)
    assert out.residues[4].name == "MET"
    assert all(a.resname == "MET" for a in out.residues[4].atoms)


def test_replace_nonstandard_sep_drops_phosphate():
    import dataclasses

    s = read_pdb(CHIGNOLIN)
    for r in s.residues:
        if r.name == "THR":
            r.name = "TPO"
            r.atoms = [dataclasses.replace(a, resname="TPO") for a in r.atoms]
            r.atoms.append(dataclasses.replace(
                r.atoms[0], name="P", element="P"))
            break
    out = replace_nonstandard(s)
    thr = next(r for r in out.residues if r.name == "THR")
    assert all(a.name != "P" for a in thr.atoms)
    # end-to-end: prepares cleanly (repair + H-add absorb the edit)
    p = Protein(out).prepare()
    assert p.topology.n_atoms > 0


def test_formal_charge_counts_divalent_ions_and_tip3_waters():
    """MG2+ contributes +2 to neutralization accounting; TIP3/SOL-named
    waters are excluded from the termini walk like HOH."""
    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
    from pmarlo_tpu.protein.solvate import structure_formal_charge

    def res(name, rid, atoms, chain="A"):
        return PDBResidue(name=name, resid=rid, chain=chain, atoms=[
            PDBAtom(name=a, resname=name, resid=rid, chain=chain,
                    xyz=(0.1 * rid, 0.0, 0.0), element=a[0])
            for a in atoms
        ])

    s = PDBStructure(residues=[
        res("MG", 1, ["MG"], chain="I"),
        res("TIP3", 2, ["O", "H1", "H2"], chain="W"),
        res("SOL", 3, ["O", "H1", "H2"], chain="W"),
    ])
    # MG alone: +2; waters contribute nothing (no spurious termini)
    assert structure_formal_charge(s) == 2


def test_cubic_box_shape():
    """Rotation-safe cube: equal edges = bounding-sphere diameter +
    2*padding, always >= the per-axis rectangular box."""
    from pmarlo_tpu.data import alanine_dipeptide_structure

    s = alanine_dipeptide_structure()
    solv, box = solvate_structure(s, padding=0.6, box_shape="cubic")
    assert box[0] == box[1] == box[2]
    assert solv.tilt is None
    coords = s.coordinates()
    center = 0.5 * (coords.min(axis=0) + coords.max(axis=0))
    radius = np.sqrt(((coords - center) ** 2).sum(-1).max())
    assert abs(box[0] - 2 * (radius + 0.6)) < 1e-9
    rect, rbox = solvate_structure(s, padding=0.6)
    assert all(box[0] >= rb - 1e-9 for rb in rbox)


def test_positive_ion_selects_potassium(chignolin):
    solvated, _ = solvate_structure(chignolin, padding=0.8,
                                    positive_ion="K")
    names = [r.name for r in solvated.residues]
    assert names.count("K") == 2 and names.count("NA") == 0
    # species must carry a matching template (build path accepts it)
    from pmarlo_tpu.md.residues import TEMPLATES

    (atype, q), = TEMPLATES["K"]["atoms"].values()
    assert q == 1.0


def test_positive_ion_validates():
    import pytest

    from pmarlo_tpu.io.pdb import read_pdb

    with pytest.raises(ValueError, match="positive_ion"):
        solvate_structure(read_pdb(CHIGNOLIN), padding=0.8,
                          positive_ion="MG")
