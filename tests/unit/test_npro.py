"""N-terminal proline: template, protonation, and end-to-end prep.

Closes the round-3 parity hole: PDBFixer handles PRO-initial chains
(reference src/pmarlo/protein/protein.py:334-373) while
make_terminal_variant raised NotImplementedError here.
"""

import copy
from pathlib import Path

import numpy as np
import pytest

from pmarlo_tpu.md.residues import TEMPLATES, get_template

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")


def test_npro_template_total_charge_is_plus_one():
    tmpl = TEMPLATES["NPRO"]
    total = sum(q for (_, q) in tmpl["atoms"].values())
    assert total == pytest.approx(1.0, abs=1e-9)
    # secondary-amine terminus: two H on N (ring CD takes the third slot)
    n_h = [b for b in tmpl["bonds"] if "N" in b and any(
        x.startswith("H") for x in b)]
    assert len(n_h) == 2
    assert "H1" not in tmpl["atoms"]


def test_get_template_nterm_pro_no_longer_raises():
    tmpl = get_template("PRO", is_nterm=True)
    assert tmpl is TEMPLATES["NPRO"]
    assert tmpl["head"] is None


@pytest.mark.skipif(not CHIGNOLIN.exists(),
                    reason="chignolin test asset not mounted")
def test_pro_initial_chain_prepares_and_builds():
    from pmarlo_tpu.io.pdb import PDBStructure, read_pdb
    from pmarlo_tpu.md.forces import potential_energy
    from pmarlo_tpu.protein.protein import Protein

    full = read_pdb(CHIGNOLIN)
    names = [r.name for r in full.residues]
    start = names.index("PRO")
    trunc = PDBStructure(
        residues=copy.deepcopy(full.residues[start:]),
        n_models=full.n_models,
    )
    # strip input hydrogens so the terminal variant is built from scratch
    for r in trunc.residues:
        r.atoms = [a for a in r.atoms if not a.element.startswith("H")]
    p = Protein(trunc).prepare()
    assert p.structure.residues[0].name == "PRO"
    first = p.structure.residues[0]
    hs = {a.name for a in first.atoms if a.name.startswith("H")}
    assert {"H2", "H3"} <= hs and "H1" not in hs
    system, positions = p.create_system()
    e = float(potential_energy(system, positions))
    assert np.isfinite(e)
    # NH2+ terminus -> the net formal charge includes the +1 terminus
    assert p.get_properties()["formal_charge"] == int(round(
        sum(float(system.charges[i]) for i in range(len(system.charges)))
    ))
