"""Missing heavy-atom reconstruction (PDBFixer addMissingAtoms parity,
reference protein/protein.py:334-373)."""

import copy
import math
from pathlib import Path

import numpy as np
import pytest

from pmarlo_tpu.io.pdb import read_pdb
from pmarlo_tpu.md.ff_params import lookup_bond
from pmarlo_tpu.md.residues import TEMPLATES
from pmarlo_tpu.protein.protein import Protein
from pmarlo_tpu.protein.repair import (
    find_missing_heavy_atoms,
    repair_missing_atoms,
)
from pmarlo_tpu.utils.errors import TopologyError

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")

pytestmark = pytest.mark.skipif(
    not CHIGNOLIN.exists(), reason="chignolin test asset not mounted"
)


def _strip(structure, targets):
    """Remove named atoms from the first residue of each targeted type."""
    s = copy.deepcopy(structure)
    seen = set()
    dropped = 0
    for r in s.residues:
        if r.name in targets and r.name not in seen:
            seen.add(r.name)
            before = len(r.atoms)
            r.atoms = [a for a in r.atoms if a.name.strip() not in targets[r.name]]
            dropped += before - len(r.atoms)
    assert dropped > 0, "strip targets matched nothing"
    return s


@pytest.fixture
def chignolin():
    return read_pdb(CHIGNOLIN)


def test_find_missing(chignolin):
    assert find_missing_heavy_atoms(chignolin) == {}
    stripped = _strip(chignolin, {"TYR": {"OH", "CZ"}, "THR": {"OG1", "CG2"}})
    miss = find_missing_heavy_atoms(stripped)
    names = {n for v in miss.values() for n in v}
    assert {"OH", "CZ", "OG1", "CG2"} <= names


def test_repair_truncated_side_chains(chignolin):
    stripped = _strip(
        chignolin,
        {"TYR": {"OH", "CZ", "CE1", "CE2"}, "TRP": {"CH2", "CZ2", "CZ3"},
         "GLU": {"OE1", "OE2", "CD"}},
    )
    miss = find_missing_heavy_atoms(stripped)
    repaired = repair_missing_atoms(stripped)
    assert find_missing_heavy_atoms(repaired) == {}

    # rebuilt bonds sit at (near) force-field equilibrium lengths
    for (chain, resid, resname), names in miss.items():
        res = next(r for r in repaired.residues
                   if r.chain == chain and r.resid == resid)
        pos = {a.name.strip(): np.asarray(a.xyz) for a in res.atoms}
        tpl = TEMPLATES[resname]
        types = {n: t for n, (t, _q) in tpl["atoms"].items()}
        for a, b in tpl["bonds"]:
            if (a in names or b in names) and a in pos and b in pos:
                d = float(np.linalg.norm(pos[a] - pos[b])) * 10.0  # nm -> A
                _, r0 = lookup_bond(types[a], types[b])
                # ring-closure bonds can deviate before minimization, but
                # chain-placed bonds are exact; accept a loose envelope
                assert d < r0 * 2.0 and d > r0 * 0.5, (resname, a, b, d, r0)


def test_repair_is_noop_on_complete_structure(chignolin):
    out = repair_missing_atoms(chignolin)
    assert out is chignolin  # fast path: nothing missing, same object


@pytest.mark.slow
def test_prepare_with_repair_end_to_end(chignolin):
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    stripped = _strip(chignolin, {"TYR": {"OH", "CZ", "CE1", "CE2"}})
    p = Protein(stripped).prepare()
    system, pos = p.create_system()
    import jax.numpy as jnp

    from pmarlo_tpu.md.forces import potential_energy
    from pmarlo_tpu.md.minimize import minimize_energy

    e0 = float(potential_energy(system, jnp.asarray(pos)))
    assert math.isfinite(e0)
    _, emin = minimize_energy(system, jnp.asarray(pos), max_iterations=200)
    assert float(emin) < 0.0  # relaxes into a bound conformation


def test_prepare_repair_disabled_fails_fast(chignolin):
    stripped = _strip(chignolin, {"TYR": {"OH"}})
    with pytest.raises(TopologyError):
        Protein(stripped).prepare(add_missing_atoms=False)


def test_unanchorable_residue_raises(chignolin):
    # strip everything but N: no A-B-C anchor chain exists
    s = copy.deepcopy(chignolin)
    r0 = s.residues[3]
    r0.atoms = [a for a in r0.atoms if a.name.strip() == "N"]
    with pytest.raises(TopologyError):
        repair_missing_atoms(s)


# --- loop modeling (PDBFixer addMissingResidues parity; VERDICT r2 #6) -----


def test_ccd_closes_synthetic_gap():
    """Delete 3 interior residues from 3gd8 and rebuild them: the loop
    must close onto the anchors and restore peptide connectivity."""
    from pathlib import Path

    import numpy as np

    from pmarlo_tpu.io.pdb import read_pdb
    from pmarlo_tpu.protein.loops import build_missing_loops

    pdb = Path("/root/reference/tests/_assets/3gd8.pdb")
    if not pdb.exists():
        import pytest

        pytest.skip("3gd8 not mounted")
    s = read_pdb(pdb)
    # remove residues 60..62 (interior, away from annotated helices' ends)
    removed = [r for r in s.residues if r.chain == "A" and 60 <= r.resid <= 62]
    assert len(removed) == 3
    removed_names = [r.name for r in removed]
    s.residues = [r for r in s.residues if r not in removed]

    gaps = {("A", 59, 63): 3}
    new_s, closures = build_missing_loops(
        s, gaps, sequences={("A", 59, 63): removed_names}
    )
    assert closures[("A", 59, 63)] < 0.05          # nm anchor RMSD
    rebuilt = {r.resid: r for r in new_s.residues
               if r.chain == "A" and 60 <= r.resid <= 62}
    assert sorted(rebuilt) == [60, 61, 62]
    assert [rebuilt[k].name for k in (60, 61, 62)] == removed_names
    # peptide connectivity across the splice: C(i) - N(i+1) ~ 1.33 A
    by_rid = {r.resid: r for r in new_s.residues if r.chain == "A"}
    for rid in (59, 60, 61, 62):
        c = next(np.asarray(a.xyz) for a in by_rid[rid].atoms if a.name == "C")
        n = next(np.asarray(a.xyz) for a in by_rid[rid + 1].atoms
                 if a.name == "N")
        d = float(np.linalg.norm(c - n))
        assert 0.115 < d < 0.155, (rid, d)


@pytest.mark.slow
def test_add_missing_residues_end_to_end():
    """Protein.add_missing_residues + prepare: the rebuilt structure
    must template-match (side chains/H filled by repair) and produce a
    finite-energy system."""
    from pathlib import Path

    import jax.numpy as jnp
    import numpy as np

    from pmarlo_tpu.io.pdb import read_pdb
    from pmarlo_tpu.md.forces import potential_energy
    from pmarlo_tpu.protein.protein import Protein

    pdb = Path("/root/reference/tests/_assets/3gd8.pdb")
    if not pdb.exists():
        pytest.skip("3gd8 not mounted")
    s = read_pdb(pdb)
    s.residues = [r for r in s.residues
                  if not (r.chain == "A" and 60 <= r.resid <= 61)]
    p = Protein(s).prepare()
    closures = p.add_missing_residues()
    assert closures and all(v < 0.02 for v in closures.values())
    p.prepare()
    rebuilt = {r.resid: r for r in p.structure.residues
               if r.chain == "A" and r.resid in (60, 61)}
    assert sorted(rebuilt) == [60, 61]
    # side chains + hydrogens were filled by the standard repair path
    for r in rebuilt.values():
        names = {a.name for a in r.atoms}
        assert {"N", "CA", "C", "O"} <= names
        assert any(n.startswith("H") for n in names)
        assert len(names) > 5 or r.name == "GLY" 
    system, x = p.create_system()
    e = float(potential_energy(system, jnp.asarray(x, jnp.float32)))
    assert np.isfinite(e)


def test_ccd_degenerate_anchors_raise():
    """Coincident anchor atoms (zero-norm rotation axes) must raise, not
    silently return an empty loop."""
    import numpy as np
    import pytest

    from pmarlo_tpu.protein.loops import close_loop_ccd

    p = np.zeros(3)
    with pytest.raises(ValueError, match="degenerate|CCD closure failed"):
        close_loop_ccd((p, p, p), (p + 1.0, p + 1.0, p + 1.0), 2,
                       max_sweeps=10)
