"""Cell-list kernel parity vs the dense XLA reference
(md/forces.py potential_energy periodic path) in interpret mode.

The cell kernel (md/pallas_cells.py) must reproduce the dense sweep's
physics exactly: potential-shifted LJ + reaction-field Coulomb +
exclusion/1-4 semantics (VERDICT r2 next-round item #1 'energy/force
parity vs the dense min-image path')."""

import os
from pathlib import Path

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure, read_pdb
from pmarlo_tpu.md.cells import bin_atoms, ghost_pad, make_cell_grid, scatter_features
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.forces import potential_energy
from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

CHIGNOLIN = Path("/root/reference/data/chignolin.pdb")


def _water(resid, origin, chain="W"):
    ox, oy, oz = origin
    mk = lambda n, x, y, z, e: PDBAtom(
        name=n, resname="HOH", resid=resid, chain=chain,
        xyz=(x, y, z), element=e)
    return PDBResidue(name="HOH", resid=resid, chain=chain, atoms=[
        mk("O", ox, oy, oz, "O"),
        mk("H1", ox + 0.09572, oy, oz, "H"),
        mk("H2", ox - 0.02399, oy + 0.09266, oz, "H"),
    ])


def _water_box(n_side=5, spacing=0.31):
    residues = []
    rid = 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                residues.append(_water(
                    rid, (0.15 + i * spacing, 0.15 + j * spacing,
                          0.15 + k * spacing)))
                rid += 1
    s = PDBStructure(residues=residues)
    L = n_side * spacing + 0.1
    return s, (L, L, L)


@pytest.fixture(scope="module")
def water_system():
    # 125 waters, 1.65 nm box, cutoff 0.45 -> 3x3x3 cells
    s, box = _water_box(5)
    system, x = build_system(s, box=box, cutoff=0.45, hydrogen_mass=None)
    return system, jnp.asarray(x, jnp.float32)


def test_cell_grid_geometry():
    g = make_cell_grid((2.0, 2.0, 2.0), 0.6, 600)
    assert (g.nx, g.ny, g.nz) == (3, 3, 3)
    assert all(cs >= 0.6 for cs in g.cell_size)
    assert g.capacity % 8 == 0 and g.capacity >= 600 / 27


def test_binning_roundtrip(water_system):
    system, x = water_system
    g = make_cell_grid(tuple(map(float, system.box)), system.cutoff,
                       system.n_atoms)
    slot, cid, overflow, xw = bin_atoms(g, x)
    assert not bool(overflow)
    # slots unique
    assert np.unique(np.asarray(slot)).size == system.n_atoms
    from pmarlo_tpu.md.cells import molecule_groups

    slots = scatter_features(
        g, xw, slot,
        jnp.asarray(system.charges, jnp.float32),
        jnp.asarray(system.lj_sigma, jnp.float32),
        jnp.asarray(system.lj_eps, jnp.float32),
        jnp.asarray(molecule_groups(system)),
    )
    # every atom's coordinates land in its slot
    np.testing.assert_allclose(
        np.asarray(slots[:3].T)[np.asarray(slot)], np.asarray(xw), atol=1e-6
    )
    # mask channel counts exactly N atoms
    assert float(slots[6].sum()) == system.n_atoms
    ghost = ghost_pad(g, slots)
    # wrap-pad multiplicity: boundary cells appear twice per padded axis
    # (three times when an axis has a single cell)
    cid_np = np.asarray(cid)
    cz = cid_np % g.nz
    cy = (cid_np // g.nz) % g.ny
    cx = cid_np // (g.ny * g.nz)

    def mult(c, n):
        if n == 1:
            return np.full_like(c, 3)
        return 1 + ((c == 0) | (c == n - 1)).astype(np.int64)

    expected = (mult(cx, g.nx) * mult(cy, g.ny) * mult(cz, g.nz)).sum()
    assert float(ghost[6].sum()) == float(expected)


def test_energy_force_parity_water(water_system):
    system, x = water_system
    fn = build_cell_force_fn(system, interpret=True)
    e, f = fn(x)
    e_ref, g_ref = jax.value_and_grad(
        lambda p: potential_energy(system, p)
    )(x)
    assert abs(float(e) - float(e_ref)) < 0.05, (float(e), float(e_ref))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.05, rtol=1e-3
    )


def test_parity_at_perturbed_configuration(water_system):
    # parity away from the lattice-regular start (atoms cross cell
    # boundaries, wrap, change occupancy)
    system, x = water_system
    fn = build_cell_force_fn(system, interpret=True)
    rng = np.random.default_rng(0)
    xp = np.asarray(x) + rng.normal(0, 0.03, np.asarray(x).shape)
    xp = jnp.asarray(xp, jnp.float32)
    e, f = fn(xp)
    e_ref, g_ref = jax.value_and_grad(
        lambda p: potential_energy(system, p)
    )(xp)
    assert abs(float(e) - float(e_ref)) < max(0.1, 1e-5 * abs(float(e_ref)))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.5, rtol=1e-3
    )


def test_translation_invariance(water_system):
    # shifting all atoms by an arbitrary vector (crossing the periodic
    # boundary) must not change energy
    system, x = water_system
    fn = build_cell_force_fn(system, interpret=True)
    e0, f0 = fn(x)
    shift = jnp.asarray([0.71, -1.13, 2.47], jnp.float32)
    e1, f1 = fn(x + shift)
    assert abs(float(e0) - float(e1)) < 0.05
    # forces see f32 roundoff from the re-wrapped coordinates (~1e-4 rel)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               atol=0.3, rtol=1e-3)


def test_overflow_poisons_loudly():
    # all atoms piled into one cell must overflow capacity -> NaN energy,
    # never silently-wrong forces
    s, box = _water_box(4)
    system, x = build_system(s, box=box, cutoff=0.45, hydrogen_mass=None)
    fn = build_cell_force_fn(system, interpret=True, occupancy_margin=1.0)
    # pile at the box CENTER so wrapping can't spread atoms over the
    # corner cells — one cell must overflow its capacity
    center = np.asarray(box, float) / 2.0
    x_piled = jnp.asarray(
        center + 0.02 * np.random.default_rng(0).normal(
            size=(system.n_atoms, 3)),
        jnp.float32,
    )
    e, f = fn(x_piled)
    assert not np.isfinite(float(e))


@pytest.mark.slow
def test_solvated_chignolin_parity():
    if not CHIGNOLIN.exists():
        pytest.skip("chignolin not mounted")
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(read_pdb(CHIGNOLIN)).prepare(solvate=True, solvent_padding=0.8)
    system, x = p.create_system(explicit_solvent=True, cutoff=0.9)
    x = jnp.asarray(x, jnp.float32)
    fn = build_cell_force_fn(system, interpret=True)
    e, f = fn(x)
    e_ref, g_ref = jax.value_and_grad(
        lambda pnt: potential_energy(system, pnt)
    )(x)
    assert abs(float(e) - float(e_ref)) < 0.1, (float(e), float(e_ref))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.1, rtol=1e-3
    )
