"""SHAKE/RATTLE H-bond constraints: the OpenMM-parity protocol
(HBonds + HMR 1.5 + 2 fs, reference simulation/__init__.py:68-70)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.md.constraints import (
    build_h_constraints,
    constraint_violation,
    rattle,
    shake,
)
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.integrate import run_md, thermalize
from pmarlo_tpu.md.minimize import minimize_energy


@pytest.fixture(scope="module")
def constrained_system():
    topo_sys, positions = build_system(
        alanine_dipeptide_structure(), hydrogen_mass=1.5
    )
    spec = build_h_constraints(topo_sys, layout="onehot")
    return topo_sys, positions, spec


def test_constraint_set(constrained_system):
    system, _, spec = constrained_system
    # alanine dipeptide: 12 hydrogens, each in exactly one bond
    assert spec.s1.shape[0] == 12


def test_shake_projects_onto_manifold(constrained_system):
    system, positions, spec = constrained_system
    rng = np.random.default_rng(0)
    x_ref = positions
    x_new = positions + jnp.asarray(
        rng.normal(0, 0.005, positions.shape), positions.dtype
    )
    x_proj = shake(spec, x_new, x_ref)
    assert float(constraint_violation(spec, x_proj)) < 1e-5


def test_rattle_removes_bond_velocities(constrained_system):
    system, positions, spec = constrained_system
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(0, 1.0, positions.shape), positions.dtype)
    v_proj = rattle(spec, v, positions)
    d = np.asarray(spec.s1 @ positions - spec.s2 @ positions)
    dv = np.asarray(spec.s1 @ v_proj - spec.s2 @ v_proj)
    radial = np.abs((d * dv).sum(axis=1)) / np.linalg.norm(d, axis=1)
    assert radial.max() < 1e-4


@pytest.mark.slow
def test_constrained_dynamics_2fs_hmr15(constrained_system):
    """The reference protocol: 2 fs, HMR 1.5, H-bonds constrained —
    dynamics must stay stable and on the constraint manifold."""
    system, positions, spec = constrained_system
    x_min, _ = minimize_energy(system, positions, max_iterations=200)
    x_min = shake(spec, x_min, positions)
    state = thermalize(system, x_min, jax.random.PRNGKey(3), 300.0)
    final, frames = run_md(
        system, state, n_steps=1000, dt=0.002, friction=1.0,
        temperature_K=300.0, report_interval=100, constraints=spec,
    )
    assert np.isfinite(np.asarray(final.positions)).all()
    assert float(constraint_violation(spec, final.positions)) < 1e-4
    temps = np.asarray(frames["temperature"])
    assert 150 < temps[3:].mean() < 450



@pytest.fixture(scope="module")
def rolled_pair(constrained_system):
    system, positions, onehot_spec = constrained_system
    rolled = build_h_constraints(system)  # default layout
    return system, positions, onehot_spec, rolled


def test_rolled_spec_counts(rolled_pair):
    from pmarlo_tpu.md.constraints import RolledConstraintSpec, n_constraints

    _, _, onehot_spec, rolled = rolled_pair
    assert isinstance(rolled, RolledConstraintSpec)
    assert n_constraints(rolled) == n_constraints(onehot_spec) == 12


def test_shake_rolled_matches_onehot(rolled_pair):
    system, positions, onehot_spec, rolled = rolled_pair
    rng = np.random.default_rng(2)
    x_new = positions + jnp.asarray(
        rng.normal(0, 0.005, positions.shape), positions.dtype
    )
    xa = shake(onehot_spec, x_new, positions)
    xb = shake(rolled, x_new, positions)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=2e-6)
    assert float(constraint_violation(rolled, xb)) < 1e-5


def test_rattle_rolled_matches_onehot(rolled_pair):
    system, positions, onehot_spec, rolled = rolled_pair
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(0, 1.0, positions.shape), positions.dtype)
    va = rattle(onehot_spec, v, positions)
    vb = rattle(rolled, v, positions)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=2e-5)


def test_rolled_spec_negative_deltas():
    """Pairs stored (H, heavy) give negative offsets; the roll layout
    must handle them identically to the one-hot reference."""
    from pmarlo_tpu.md.constraints import (
        _build_rolled_spec,
        constraint_violation,
        shake_rolled,
    )

    rng = np.random.default_rng(5)
    n = 16
    masses = rng.uniform(1.0, 16.0, n)
    # mixed-sign offsets, including a wrap-adjacent pair at the end
    pairs = np.array([[3, 1], [5, 7], [10, 8], [14, 15]])
    r0 = np.full(4, 0.1)
    spec = _build_rolled_spec(pairs, r0, masses, n_iter=40)
    x0 = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    x_new = x0 + jnp.asarray(rng.normal(0, 0.01, (n, 3)), jnp.float32)
    xp = shake_rolled(spec, x_new, x0)
    assert float(constraint_violation(spec, xp)) < 1e-4


def test_water_block_requires_canonical_order():
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system

    # alanine has no waters: build_h_constraints returns the plain
    # rolled spec, not a composite
    from pmarlo_tpu.md.constraints import (
        RolledConstraintSpec,
        build_h_constraints,
    )

    system, _ = build_system(alanine_dipeptide_structure())
    spec = build_h_constraints(system)
    assert isinstance(spec, RolledConstraintSpec)


@pytest.mark.slow
def test_strip_constrained_bonded():
    # OpenMM createSystem semantics: constrained X-H bonds and
    # rigid-water angles carry no bonded force terms in the MD system
    from pmarlo_tpu.md.constraints import strip_constrained_bonded
    from pmarlo_tpu.protein.solvate import solvate_structure

    struct = alanine_dipeptide_structure()
    solvated, box = solvate_structure(struct, padding=0.8)
    system, x = build_system(solvated, box=box, cutoff=0.7,
                             hydrogen_mass=None)
    stripped = strip_constrained_bonded(system)
    bonds = np.asarray(system.bond_idx)
    sbonds = np.asarray(stripped.bond_idx)
    from pmarlo_tpu.md.ff_params import TYPE_ELEMENTS

    is_h = np.asarray([
        TYPE_ELEMENTS.get(t, "X") == "H" for t in system.atom_types
    ])
    n_h_bonds = int((is_h[bonds[:, 0]] | is_h[bonds[:, 1]]).sum())
    assert sbonds.shape[0] == bonds.shape[0] - n_h_bonds
    assert not (is_h[sbonds[:, 0]] | is_h[sbonds[:, 1]]).any()
    # every remaining angle has at least one non-water atom
    water = np.asarray([
        rn in ("HOH", "WAT") for rn in system.residue_names
    ])
    sang = np.asarray(stripped.angle_idx)
    assert not (water[sang[:, 0]] & water[sang[:, 1]]
                & water[sang[:, 2]]).any()
    # protein angles (incl. those with H) survive
    ang = np.asarray(system.angle_idx)
    n_water_angles = int((water[ang[:, 0]] & water[ang[:, 1]]
                          & water[ang[:, 2]]).sum())
    assert sang.shape[0] == ang.shape[0] - n_water_angles
    # at constraint-satisfied geometry the dropped terms carry ~0 energy
    from pmarlo_tpu.md.constraints import shake
    from pmarlo_tpu.md.forces import angle_energy, bond_energy

    spec = build_h_constraints(system)
    xc = shake(spec, jnp.asarray(x, jnp.float32),
               jnp.asarray(x, jnp.float32))
    e_full = float(bond_energy(system, xc) + angle_energy(system, xc))
    e_strip = float(bond_energy(stripped, xc) + angle_energy(stripped, xc))
    # dropped terms are near their minima: small absolute difference
    assert abs(e_full - e_strip) < 0.5 * max(1, n_h_bonds) * 0.05


def test_sol_named_waters_get_rigid_treatment():
    # GROMACS-style naming (resname SOL, atoms OW/HW1/HW2) must route
    # through the same rigid-water path as HOH: H-H closure constraint,
    # exact water solver, and angle stripping (shared _WATER_NAMES set)
    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
    from pmarlo_tpu.md.constraints import (
        CompositeConstraintSpec,
        RigidWaterSpec,
        strip_constrained_bonded,
    )

    def atom(name, resid, xyz, element):
        return PDBAtom(name=name, resname="SOL", resid=resid, chain="A",
                       xyz=xyz, element=element)

    residues = []
    rid = 1
    for i in range(3):
        for j in range(3):
            for k in range(3):
                ox = (0.2 + i * 0.31, 0.2 + j * 0.31, 0.2 + k * 0.31)
                residues.append(PDBResidue(
                    name="SOL", resid=rid, chain="A", atoms=[
                        atom("OW", rid, ox, "O"),
                        atom("HW1", rid,
                             (ox[0] + 0.09572, ox[1], ox[2]), "H"),
                        atom("HW2", rid,
                             (ox[0] - 0.0239, ox[1] + 0.0927, ox[2]),
                             "H"),
                    ]))
                rid += 1
    s = PDBStructure(residues=residues)
    L = 3 * 0.31 + 0.2
    system, x = build_system(s, box=(L, L, L), cutoff=0.45,
                             hydrogen_mass=None)
    spec = build_h_constraints(system)
    water = (spec.water if isinstance(spec, CompositeConstraintSpec)
             else spec)
    assert isinstance(water, RigidWaterSpec)
    assert water.n_waters == 27
    stripped = strip_constrained_bonded(system)
    assert np.asarray(stripped.angle_idx).shape[0] == 0
    assert np.asarray(stripped.bond_idx).shape[0] == 0
