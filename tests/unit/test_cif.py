"""mmCIF intake parity: read_cif/write_cif round trips and Protein(.cif).

The reference Protein constructor accepts ``.cif`` files (reference
src/pmarlo/protein/protein.py:137 via PDBFixer's PdbxFile loader);
these tests pin the first-party parser to the same behavior on the
structures the rest of the suite already exercises.
"""

import numpy as np
import pytest

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.io.cif import read_cif, read_structure, write_cif
from pmarlo_tpu.io.pdb import read_pdb, write_pdb


def test_cif_round_trip_matches_structure(tmp_path):
    s = alanine_dipeptide_structure()
    path = tmp_path / "ala2.cif"
    write_cif(path, s)
    back = read_cif(path)
    assert back.n_atoms == s.n_atoms
    assert [r.name for r in back.residues] == [r.name for r in s.residues]
    assert [a.name for r in back.residues for a in r.atoms] == [
        a.name for r in s.residues for a in r.atoms
    ]
    np.testing.assert_allclose(
        back.coordinates(), s.coordinates(), atol=5.1e-5
    )  # 0.001 A text rounding


def test_cif_and_pdb_agree_on_same_structure(tmp_path):
    s = alanine_dipeptide_structure()
    cif = tmp_path / "x.cif"
    pdb = tmp_path / "x.pdb"
    write_cif(cif, s)
    atoms = [a for r in s.residues for a in r.atoms]
    write_pdb(pdb, s.coordinates(), [a.name for a in atoms],
              [a.resname for a in atoms], [a.resid for a in atoms],
              elements=[a.element for a in atoms])
    a = read_cif(cif)
    b = read_pdb(pdb)
    np.testing.assert_allclose(a.coordinates(), b.coordinates(), atol=1e-4)
    assert [r.resid for r in a.residues] == [r.resid for r in b.residues]


def test_read_structure_dispatches_by_suffix(tmp_path):
    s = alanine_dipeptide_structure()
    cif = tmp_path / "d.cif"
    write_cif(cif, s)
    assert read_structure(cif).n_atoms == s.n_atoms


def test_cif_cell_and_seqres(tmp_path):
    text = """\
data_test
_cell.length_a   30.000
_cell.length_b   40.000
_cell.length_c   50.000
_cell.angle_alpha 90.00
_cell.angle_beta  90.00
_cell.angle_gamma 90.00
#
loop_
_pdbx_poly_seq_scheme.asym_id
_pdbx_poly_seq_scheme.pdb_strand_id
_pdbx_poly_seq_scheme.mon_id
A A ALA
A A GLY
A A SER
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.pdbx_PDB_model_num
ATOM 1 N N . ALA A 1 1.000 2.000 3.000 1
ATOM 2 C CA . ALA A 1 2.000 2.000 3.000 1
ATOM 3 C CA B ALA A 1 9.000 9.000 9.000 1
ATOM 4 N N . ALA A 1 5.000 5.000 5.000 2
"""
    path = tmp_path / "mini.cif"
    path.write_text(text)
    s = read_cif(path)
    # altloc B dropped, model 2 dropped
    assert s.n_atoms == 2
    assert s.box == pytest.approx((3.0, 4.0, 5.0))
    assert s.seqres == {"A": ["ALA", "GLY", "SER"]}
    np.testing.assert_allclose(
        s.residues[0].atoms[0].xyz, (0.1, 0.2, 0.3)
    )
    # model selection works
    s2 = read_cif(path, model=2)
    assert s2.n_atoms == 1


def test_cif_quoted_atom_names(tmp_path):
    text = """\
data_q
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.auth_asym_id
_atom_site.auth_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
ATOM 1 C "C1'" DA A 1 0.000 0.000 0.000
ATOM 2 O "O5'" DA A 1 1.000 0.000 0.000
"""
    path = tmp_path / "q.cif"
    path.write_text(text)
    s = read_cif(path)
    assert [a.name for a in s.residues[0].atoms] == ["C1'", "O5'"]


def test_protein_accepts_cif(tmp_path):
    from pmarlo_tpu.protein.protein import Protein

    s = alanine_dipeptide_structure()
    cif = tmp_path / "ala2.cif"
    write_cif(cif, s)
    p = Protein(cif).prepare()
    system, positions = p.create_system()
    from pmarlo_tpu.md.forces import potential_energy

    e = float(potential_energy(system, positions))
    assert np.isfinite(e)
    props = p.get_properties()
    assert props["n_residues"] >= 1


def test_missing_seq_ids_group_consecutive_waters(tmp_path):
    """label_seq_id is '.' for every non-polymer atom per the PDBx
    spec — atoms must group into residues (by consecutive chain+name
    runs), not fragment one water into three single-atom residues."""
    text = """data_w
loop_
_atom_site.group_PDB
_atom_site.label_atom_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_seq_id
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
HETATM O HOH A . 0.0 0.0 0.0
HETATM H1 HOH A . 0.8 0.0 0.0
HETATM H2 HOH A . 0.0 0.8 0.0
HETATM O HOH A . 5.0 0.0 0.0
HETATM H1 HOH A . 5.8 0.0 0.0
HETATM H2 HOH A . 5.0 0.8 0.0
"""
    path = tmp_path / "w.cif"
    path.write_text(text)
    s = read_cif(path)
    assert len(s.residues) == 2
    assert all(len(r.atoms) == 3 for r in s.residues)


def test_write_cif_marks_ions_and_waters_hetatm(tmp_path):
    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure

    residues = []
    for i, (rname, aname, elem) in enumerate(
        [("MG", "MG", "Mg"), ("K", "K", "K"), ("SOL", "O", "O")], start=1
    ):
        residues.append(PDBResidue(
            name=rname, resid=i, chain="A",
            atoms=[PDBAtom(name=aname, xyz=(float(i), 0.0, 0.0),
                           element=elem, resname=rname, resid=i,
                           chain="A")],
        ))
    path = tmp_path / "ions.cif"
    write_cif(path, PDBStructure(residues=residues))
    rows = [ln for ln in path.read_text().splitlines()
            if ln.startswith(("ATOM", "HETATM"))]
    assert len(rows) == 3 and all(r.startswith("HETATM") for r in rows)
