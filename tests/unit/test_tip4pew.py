"""TIP4P-Ew 4-site water: virtual-site machinery end to end.

The reference reaches 4-site waters through OpenMM's amber14/tip4pew.xml
(ForceField virtual sites; /root/reference/src/pmarlo/protein/
protein.py:334-373 solvation path). Here the M site is a massless
particle whose position is a linear parent map (md/vsites.py): these
tests pin the geometry, the exclusion graph, the force spread (J^T) via
the finite-difference oracle on PHYSICAL dofs, and NVE stability of a
rigid 4-site box — the VERDICT r4 item 8 acceptance bar.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.vsites import n_vsites, vsite_positions, vsite_spread

_W_M = (0.786646558, 0.106676721, 0.106676721)
_OH, _THETA = 0.09572, np.radians(104.52)


def _t4_water(resid, origin, rng=None, chain="W"):
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
    m = _W_M[0] * xyz[0] + _W_M[1] * xyz[1] + _W_M[2] * xyz[2]
    names = [("O", "O"), ("H1", "H"), ("H2", "H"), ("M", "M")]
    pts = [xyz[0], xyz[1], xyz[2], m]
    return PDBResidue(name="HOH", resid=resid, chain=chain, atoms=[
        PDBAtom(name=n, resname="HOH", resid=resid, chain=chain,
                xyz=tuple(float(v) for v in p), element=e)
        for (n, e), p in zip(names, pts)
    ])


def _t4_box(n_side=3, spacing=0.31, seed=0):
    rng = np.random.default_rng(seed)
    residues, rid = [], 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                residues.append(_t4_water(
                    rid, (0.15 + i * spacing, 0.15 + j * spacing,
                          0.15 + k * spacing), rng))
                rid += 1
    L = n_side * spacing + 0.35
    return PDBStructure(residues=residues), (L, L, L)


@pytest.fixture(scope="module")
def t4_system():
    s, box = _t4_box(3)
    system, x = build_system(s, box=box, cutoff=0.5, hydrogen_mass=None)
    return system, jnp.asarray(x, jnp.float32)


def test_tip4pew_topology_and_params(t4_system):
    system, x = t4_system
    n_w = 27
    assert system.n_atoms == 4 * n_w
    assert n_vsites(system) == n_w
    masses = np.asarray(system.masses)
    charges = np.asarray(system.charges)
    # M rows: massless, q = -1.04844, no LJ; O rows: q = 0, TIP4P-Ew LJ
    m_rows = np.asarray(system.vsite_idx)[:, 0]
    o_rows = np.asarray(system.vsite_idx)[:, 1]
    assert (masses[m_rows] == 0.0).all()
    np.testing.assert_allclose(charges[m_rows], -1.04844, atol=1e-6)
    np.testing.assert_allclose(charges[o_rows], 0.0, atol=1e-9)
    sig = np.asarray(system.lj_sigma)
    eps = np.asarray(system.lj_eps)
    assert (eps[m_rows] == 0.0).all()
    # sigma = 2 * rmin/2 / 2^(1/6) = 0.316435 nm (Horn 2004)
    np.testing.assert_allclose(sig[o_rows], 0.316435, atol=2e-5)
    assert abs(float(charges.sum())) < 1e-5
    # intra-water pairs (incl. M) fully excluded via the zero-k O-M bond
    excl = set(map(tuple, np.asarray(system.excl12_idx)))
    i0 = 0  # first water occupies rows 0..3
    for a in range(4):
        for b in range(a + 1, 4):
            assert (i0 + a, i0 + b) in excl


def test_vsite_geometry(t4_system):
    system, x = t4_system
    idx = np.asarray(system.vsite_idx)
    xe = np.asarray(vsite_positions(x, system.vsite_idx,
                                    system.vsite_weights))
    for row in idx:
        m, o, h1, h2 = row
        d_om = np.linalg.norm(xe[m] - xe[o])
        np.testing.assert_allclose(d_om, 0.0125, atol=2e-4)
        # on the bisector: OM parallel to (H1-O)+(H2-O)
        bis = (xe[h1] - xe[o]) + (xe[h2] - xe[o])
        cosang = np.dot(xe[m] - xe[o], bis) / (d_om * np.linalg.norm(bis))
        np.testing.assert_allclose(cosang, 1.0, atol=1e-5)


def test_spread_is_transpose_of_expand(t4_system):
    """vsite_spread must be EXACTLY the J^T of vsite_positions: forces
    from the hand-spread path equal jax.grad through the expansion."""
    system, x = t4_system
    idx, w = system.vsite_idx, system.vsite_weights
    rng = np.random.default_rng(1)
    g_out = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    # <J^T g, dx> == <g, J dx> for arbitrary dx (adjoint identity)
    dx = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    # J dx: differential of expand at x in direction dx
    jdx = jax.jvp(lambda v: vsite_positions(v, idx, w), (x,), (dx,))[1]
    lhs = float(jnp.sum(vsite_spread(g_out, idx, w) * dx))
    # the site rows of dx are overwritten by expand (J has zero columns
    # there), and spread zeroes the site rows of J^T g to match
    rhs = float(jnp.sum(g_out * jdx))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_fd_force_parity_on_physical_dofs(t4_system):
    """Wrapped force fn vs central finite differences of the wrapped
    energy, displacing PHYSICAL atoms (O/H) — the tests/force FD oracle
    discipline (/root/reference/tests/force/test_fd_vs_torchforce.py)."""
    from pmarlo_tpu.md.pallas_periodic import build_periodic_force_fn

    system, x = t4_system
    fn = build_periodic_force_fn(system, interpret=True)
    e0, f = fn(x)
    assert np.isfinite(float(e0)) and np.isfinite(np.asarray(f)).all()
    m_rows = set(int(i) for i in np.asarray(system.vsite_idx)[:, 0])
    rng = np.random.default_rng(2)
    h = 2e-4
    checked = 0
    x64 = np.asarray(x, np.float64)
    for _ in range(8):
        a = int(rng.integers(system.n_atoms))
        if a in m_rows:
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
    # virtual-site rows carry zero force after the spread
    f_np = np.asarray(f)
    assert (f_np[sorted(m_rows)] == 0.0).all()


@pytest.mark.slow
def test_tip4pew_nve_stable(tmp_path):
    """Rigid TIP4P-Ew box holds NVE: finite energies, bounded drift,
    temperature near target (VERDICT r4 item 8 acceptance)."""
    from pmarlo_tpu.io.pdb import write_pdb
    import pmarlo_tpu

    s, box = _t4_box(4, seed=3)
    atoms = [a for r in s.residues for a in r.atoms]
    pdb = str(tmp_path / "t4.pdb")
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
    # bounded drift: < 2 kJ/mol per water over the short window
    assert abs(float(et[-1] - et[0])) < 2.0 * 64


def test_solvate_water_model_tip4pew():
    from pmarlo_tpu.protein.solvate import solvate_structure
    from pmarlo_tpu.data import alanine_dipeptide_structure

    s, box = solvate_structure(
        alanine_dipeptide_structure(), padding=1.0,
        water_model="tip4pew",
    )
    waters = [r for r in s.residues if r.name == "HOH"]
    assert waters and all(len(r.atoms) == 4 for r in waters)
    assert all(r.atoms[3].name == "M" for r in waters)
    system, x = build_system(s, box=box, cutoff=0.9, hydrogen_mass=None)
    assert n_vsites(system) == len(waters)
    # constraints build with the 4-site stride
    from pmarlo_tpu.md.constraints import build_h_constraints

    spec = build_h_constraints(system)
    assert spec is not None and spec.water is not None
    assert spec.water.stride == 4
    assert spec.water.n_waters == len(waters)
