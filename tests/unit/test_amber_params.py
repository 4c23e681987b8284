"""Amber frcmod / parm.dat / OFF .lib loaders (md/amber_params.py).

The reference gets lipid17 + OL15/OL3 through OpenMM's amber14 XML
bundle (reference src/pmarlo/simulation/__init__.py:64-67); this image
ships no Amber data files, so the loaders are validated on synthetic
files written in the PUBLISHED formats, end-to-end through build_system
(a loaded torsion refit must change the built System's torsion_k).
"""

import numpy as np
import pytest

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.md import ff_params as ff
from pmarlo_tpu.md.amber_params import (
    AmberFormatError,
    install_parameters,
    install_templates,
    load_amber_files,
    parameter_snapshot,
    parse_frcmod,
    parse_off_lib,
    parse_parm_dat,
)
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.residues import NONPOLYMER, TEMPLATES, get_template

FRCMOD = """refit example in the frcmod format
MASS
Q1 12.01         0.616

BOND
Q1-CT  310.0    1.526

ANGLE
Q1-CT-CT    40.0      109.50

DIHE
X -Q1-CT-X    9    1.40        0.0            3.
CT-Q1-CT-CT   1    0.20        180.0         -2.
CT-Q1-CT-CT   1    0.80        0.0            3.

IMPROPER
X -X -Q1-O          10.5         180.          2.

NONBON
  Q1          1.9080  0.1094

END
"""

PARM_DAT = """tiny parm.dat in the main-file format
Q2 14.01         0.530
Q3 1.008         0.161

Q2  Q3
Q2-Q3  434.0    1.010

Q3-Q2-Q3    35.0      109.50

X -Q2-Q3-X    6    0.00          0.0             3.

X -X -Q2-Q3  1.0          180.          2.

  Q3  Q2  0000.     0000.     4.

Q2  Q4

MOD4      RE
  Q2          1.8240  0.1700
  Q3          0.6000  0.0157

END
"""

OFF_LIB = """!!index array str
 "QLG"
!entry.QLG.unit.atoms table  str name  str type  int typex  int resx  int flags  int seq  int elmnt  dbl chg
 "C1" "Q1" 0 1 131072 1 6 -0.3
 "C2" "CT" 0 1 131072 2 6 0.1
 "H1" "HC" 0 1 131072 3 1 0.1
 "H2" "HC" 0 1 131072 4 1 0.1
!entry.QLG.unit.connectivity table  int atom1x  int atom2x  int flags
 1 2 1
 2 3 1
 2 4 1
!entry.QLG.unit.connect array int
 1
 2
!entry.QLG.unit.residues table  str name  int seq  int childseq  int startatomx  str restype  int imagingx
 "QLG" 1 5 1 "?" 0
"""


def test_parse_frcmod_sections():
    pset = parse_frcmod(FRCMOD)
    assert pset.masses["Q1"] == 12.01
    assert pset.bonds[frozenset(("Q1", "CT"))] == (310.0, 1.526)
    assert pset.angles[("Q1", "CT", "CT")] == (40.0, 109.50)
    assert pset.dihedrals[("X", "Q1", "CT", "X")] == [(9.0, 1.40, 0.0, 3.0)]
    # the negative periodicity chains two Fourier terms onto ONE key
    assert pset.dihedrals[("CT", "Q1", "CT", "CT")] == [
        (1.0, 0.20, 180.0, 2.0), (1.0, 0.80, 0.0, 3.0)]
    assert pset.impropers[("X", "X", "Q1", "O")] == (10.5, 180.0, 2.0)
    assert pset.lj["Q1"] == (1.9080, 0.1094)


def test_parse_parm_dat_with_equivalence():
    pset = parse_parm_dat(PARM_DAT)
    assert pset.masses["Q2"] == 14.01
    assert pset.bonds[frozenset(("Q2", "Q3"))] == (434.0, 1.010)
    assert pset.angles[("Q3", "Q2", "Q3")] == (35.0, 109.50)
    assert pset.dihedrals[("X", "Q2", "Q3", "X")] == [(6.0, 0.0, 0.0, 3.0)]
    assert pset.impropers[("X", "X", "Q2", "Q3")] == (1.0, 180.0, 2.0)
    # Q4 inherits Q2's LJ row via the equivalence list
    assert pset.lj["Q2"] == (1.8240, 0.1700)
    assert pset.lj["Q4"] == pset.lj["Q2"]


def test_install_parameters_and_element_inference():
    with parameter_snapshot():
        summary = install_parameters(parse_frcmod(FRCMOD))
        assert summary["new_types"] == 1
        assert ff.TYPE_MASSES["Q1"] == 12.01
        assert ff.TYPE_ELEMENTS["Q1"] == "C"
        assert ff.lookup_bond("Q1", "CT") == (310.0, 1.526)
        assert ff.lookup_angle("CT", "CT", "Q1") == (40.0, 109.50)
        assert ff.lookup_dihedral("HC", "Q1", "CT", "HC") == [
            (9.0, 1.40, 0.0, 3.0)]
    assert "Q1" not in ff.TYPE_MASSES  # snapshot restored


def test_parse_off_lib_template():
    tmpls = parse_off_lib(OFF_LIB)
    t = tmpls["QLG"]
    assert t["atoms"]["C1"] == ("Q1", -0.3)
    assert sorted(t["bonds"]) == [("C1", "C2"), ("C2", "H1"), ("C2", "H2")]
    assert t["head"] == "C1" and t["tail"] == "C2"
    with parameter_snapshot():
        install_templates(tmpls, nonpolymer=True)
        assert "QLG" in NONPOLYMER
        assert get_template("QLG")["atoms"]["C2"] == ("CT", 0.1)
    assert "QLG" not in TEMPLATES


def test_torsion_refit_changes_built_system():
    """End-to-end: loading a refit frcmod must change the torsions of a
    freshly built System — the OL15-style workflow this module exists
    for."""
    s = alanine_dipeptide_structure()
    with parameter_snapshot():
        sys0, _ = build_system(s, gb_model="gbn2")
        refit = parse_frcmod(
            "psi refit\nDIHE\n"
            "N -CT-C -N    1    2.50        180.0          1.\n\nEND\n"
        )
        install_parameters(refit)
        sys1, _ = build_system(s, gb_model="gbn2")
    k0 = np.asarray(sys0.torsion_k)
    k1 = np.asarray(sys1.torsion_k)
    # ff99SB psi carried three Fourier terms; the refit collapses the
    # quadruple to ONE term with PK=2.5 kcal -> 10.46 kJ
    assert k1.shape[0] < k0.shape[0]
    assert np.isclose(k1.max(), 2.5 * 4.184, atol=1e-6) or np.any(
        np.isclose(k1, 2.5 * 4.184, atol=1e-6))


def test_load_amber_files_dispatch(tmp_path):
    f1 = tmp_path / "frcmod.refit"
    f1.write_text(FRCMOD)
    f2 = tmp_path / "mini.lib"
    f2.write_text(OFF_LIB)
    with parameter_snapshot():
        summary = load_amber_files(str(f1), str(f2))
        assert summary["parameters"]["dihedrals"] == 2
        assert summary["residues"] == ["QLG"]
        assert "QLG" in TEMPLATES and "Q1" in ff.TYPE_LJ


def test_malformed_lines_raise():
    with pytest.raises(AmberFormatError):
        parse_frcmod("t\nBOND\nnot a bond line\n")
    with pytest.raises(AmberFormatError):
        parse_off_lib(
            "!entry.BAD.unit.atoms table str name\n \"A\" \"CT\"\n"
        )
