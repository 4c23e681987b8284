"""TIP5P 5-site water: out-of-plane virtual sites end to end.

The reference reaches multi-site waters through OpenMM ForceField XMLs
(/root/reference/src/pmarlo/protein/protein.py:334-373 solvation path);
tip5p.xml builds the lone pairs with OutOfPlaneSite constructions. Here
kind=1 sites (md/vsites.py) use the same parameterization
r = p0 + w12 d12 + w13 d13 + wcross (d12 x d13), whose Jacobian is
position-DEPENDENT — the spread is the exact VJP of the expansion.
These tests pin the geometry (O-L length, LOL angle, mirror symmetry),
the adjoint identity of the nonlinear spread, FD force parity on
physical dofs, and NVE stability of a rigid 5-site box.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.residues import _TIP5P_W, _TIP5P_WC
from pmarlo_tpu.md.vsites import n_vsites, vsite_positions, vsite_spread

_OH, _THETA = 0.09572, np.radians(104.52)
_OL, _PHI = 0.070, np.radians(109.47)


def _t5_water(resid, origin, rng=None, chain="W"):
    base = np.array([
        [0.0, 0.0, 0.0],
        [_OH, 0.0, 0.0],
        [_OH * np.cos(_THETA), _OH * np.sin(_THETA), 0.0],
    ])
    if rng is not None:
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        x, y, z, w = q
        rot = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        base = base @ rot.T
    xyz = base + np.asarray(origin)
    d12, d13 = xyz[1] - xyz[0], xyz[2] - xyz[0]
    cr = np.cross(d12, d13)
    l1 = xyz[0] + _TIP5P_W * (d12 + d13) + _TIP5P_WC * cr
    l2 = xyz[0] + _TIP5P_W * (d12 + d13) - _TIP5P_WC * cr
    names = [("O", "O"), ("H1", "H"), ("H2", "H"), ("L1", "M"), ("L2", "M")]
    pts = [xyz[0], xyz[1], xyz[2], l1, l2]
    return PDBResidue(name="HOH", resid=resid, chain=chain, atoms=[
        PDBAtom(name=n, resname="HOH", resid=resid, chain=chain,
                xyz=tuple(float(v) for v in p), element=e)
        for (n, e), p in zip(names, pts)
    ])


def _t5_box(n_side=3, spacing=0.31, seed=0):
    rng = np.random.default_rng(seed)
    residues, rid = [], 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                residues.append(_t5_water(
                    rid, (0.15 + i * spacing, 0.15 + j * spacing,
                          0.15 + k * spacing), rng))
                rid += 1
    L = n_side * spacing + 0.35
    return PDBStructure(residues=residues), (L, L, L)


@pytest.fixture(scope="module")
def t5_system():
    s, box = _t5_box(3)
    system, x = build_system(s, box=box, cutoff=0.5, hydrogen_mass=None)
    return system, jnp.asarray(x, jnp.float32)


def test_tip5p_topology_and_params(t5_system):
    system, x = t5_system
    n_w = 27
    assert system.n_atoms == 5 * n_w
    assert n_vsites(system) == 2 * n_w
    assert system.vsite_kind is not None
    assert (np.asarray(system.vsite_kind) == 1).all()
    masses = np.asarray(system.masses)
    charges = np.asarray(system.charges)
    l_rows = np.asarray(system.vsite_idx)[:, 0]
    o_rows = np.asarray(system.vsite_idx)[:, 1]
    assert (masses[l_rows] == 0.0).all()
    np.testing.assert_allclose(charges[l_rows], -0.241, atol=1e-6)
    np.testing.assert_allclose(charges[o_rows], 0.0, atol=1e-9)
    eps = np.asarray(system.lj_eps)
    sig = np.asarray(system.lj_sigma)
    assert (eps[l_rows] == 0.0).all()
    # sigma = 0.312 nm (Mahoney-Jorgensen 2000)
    np.testing.assert_allclose(sig[o_rows], 0.312, atol=2e-5)
    assert abs(float(charges.sum())) < 1e-5
    # all 10 intra-water pairs excluded via the zero-k O-L bonds
    excl = set(map(tuple, np.asarray(system.excl12_idx)))
    for a in range(5):
        for b in range(a + 1, 5):
            assert (a, b) in excl


def test_oop_site_geometry(t5_system):
    """L sites: |O-L| = 0.070 nm, LOL angle = 109.47 deg, the two L's on
    OPPOSITE sides of the HOH plane, symmetric about it."""
    system, x = t5_system
    idx = np.asarray(system.vsite_idx)
    xe = np.asarray(vsite_positions(
        x, system.vsite_idx, system.vsite_weights, system.vsite_kind))
    # rows come in (L1, L2) pairs per water sharing the same O
    for wi in range(0, idx.shape[0], 2):
        l1, o, h1, h2 = idx[wi]
        l2 = idx[wi + 1][0]
        assert idx[wi + 1][1] == o
        v1, v2 = xe[l1] - xe[o], xe[l2] - xe[o]
        np.testing.assert_allclose(np.linalg.norm(v1), _OL, atol=3e-4)
        np.testing.assert_allclose(np.linalg.norm(v2), _OL, atol=3e-4)
        cos_lol = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
        np.testing.assert_allclose(
            np.degrees(np.arccos(cos_lol)), 109.47, atol=0.1)
        # opposite sides of the HOH plane
        n_hat = np.cross(xe[h1] - xe[o], xe[h2] - xe[o])
        assert np.dot(v1, n_hat) * np.dot(v2, n_hat) < 0


def test_oop_spread_is_exact_vjp(t5_system):
    """<J^T g, dx> == <g, J dx> with the position-DEPENDENT Jacobian."""
    system, x = t5_system
    idx, w, kind = system.vsite_idx, system.vsite_weights, system.vsite_kind
    rng = np.random.default_rng(1)
    g_out = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    dx = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    jdx = jax.jvp(lambda v: vsite_positions(v, idx, w, kind), (x,), (dx,))[1]
    lhs = float(jnp.sum(vsite_spread(g_out, idx, w, kind, x) * dx))
    rhs = float(jnp.sum(g_out * jdx))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-3)
    # site rows of the spread output are zero
    f = np.asarray(vsite_spread(g_out, idx, w, kind, x))
    assert (f[np.asarray(idx)[:, 0]] == 0.0).all()


def test_kind_none_matches_linear_path(t5_system):
    """kind=None (historical layout) and an all-zeros kind array must
    agree exactly — the average branch of the where-dispatch."""
    system, x = t5_system
    idx, w = system.vsite_idx, system.vsite_weights
    kind0 = jnp.zeros(idx.shape[0], jnp.int32)
    a = np.asarray(vsite_positions(x, idx, w))
    b = np.asarray(vsite_positions(x, idx, w, kind0))
    np.testing.assert_array_equal(a, b)


def test_fd_force_parity_on_physical_dofs(t5_system):
    from pmarlo_tpu.md.pallas_periodic import build_periodic_force_fn

    system, x = t5_system
    fn = build_periodic_force_fn(system, interpret=True)
    e0, f = fn(x)
    assert np.isfinite(float(e0)) and np.isfinite(np.asarray(f)).all()
    l_rows = set(int(i) for i in np.asarray(system.vsite_idx)[:, 0])
    rng = np.random.default_rng(2)
    h = 2e-4
    checked = 0
    x64 = np.asarray(x, np.float64)
    for _ in range(10):
        a = int(rng.integers(system.n_atoms))
        if a in l_rows:
            continue
        k = int(rng.integers(3))
        xp = x64.copy()
        xp[a, k] += h
        xm = x64.copy()
        xm[a, k] -= h
        ep = float(fn(jnp.asarray(xp, jnp.float32))[0])
        em = float(fn(jnp.asarray(xm, jnp.float32))[0])
        fd = -(ep - em) / (2 * h)
        assert abs(fd - float(f[a, k])) < max(0.8, 0.02 * abs(fd)), (
            a, k, fd, float(f[a, k])
        )
        checked += 1
    assert checked >= 4
    f_np = np.asarray(f)
    assert (f_np[sorted(l_rows)] == 0.0).all()


@pytest.mark.slow
def test_tip5p_nve_stable(tmp_path):
    """Rigid TIP5P box holds NVE: finite energies, bounded drift."""
    from pmarlo_tpu.io.pdb import write_pdb
    import pmarlo_tpu

    s, box = _t5_box(4, seed=3)
    atoms = [a for r in s.residues for a in r.atoms]
    pdb = str(tmp_path / "t5.pdb")
    write_pdb(pdb, np.asarray([a.xyz for a in atoms]),
              [a.name for a in atoms], [a.resname for a in atoms],
              [a.resid for a in atoms], box=box)
    res = pmarlo_tpu.run_segment(
        pdb, n_steps=400, report_interval=50, ensemble="nve",
        nonbonded="dense", cutoff=0.5, minimize_iterations=100, seed=4,
        dt_ps=0.002,
    )
    et = np.asarray(res["total_energy"])
    assert np.isfinite(et).all()
    temps = np.asarray(res["temperature"])
    assert np.isfinite(temps).all() and 150.0 < float(temps[-1]) < 500.0
    assert abs(float(et[-1] - et[0])) < 2.0 * 64


def test_solvate_water_model_tip5p():
    from pmarlo_tpu.protein.solvate import solvate_structure
    from pmarlo_tpu.data import alanine_dipeptide_structure

    s, box = solvate_structure(
        alanine_dipeptide_structure(), padding=1.0,
        water_model="tip5p",
    )
    waters = [r for r in s.residues if r.name == "HOH"]
    assert waters and all(len(r.atoms) == 5 for r in waters)
    assert all(r.atoms[3].name == "L1" and r.atoms[4].name == "L2"
               for r in waters)
    system, x = build_system(s, box=box, cutoff=0.9, hydrogen_mass=None)
    assert n_vsites(system) == 2 * len(waters)
    from pmarlo_tpu.md.constraints import build_h_constraints

    spec = build_h_constraints(system)
    assert spec is not None and spec.water is not None
    assert spec.water.stride == 5
    assert spec.water.n_waters == len(waters)
