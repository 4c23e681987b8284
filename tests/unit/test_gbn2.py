"""GBn2 (GB-neck2) implicit solvent: neck tables, parity, physics.

The reference's MD runs amber14 + implicit/gbn2.xml
(src/pmarlo/simulation/__init__.py:64-71); this is the TPU rebuild's
matching solvent model. The neck d0/m0 tables are computed from the
geometric definition (md/gbn2.py), so these tests pin internal
consistency rather than table transcription.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.md import gbn2


def test_neck_integral_geometry():
    """The neck integral is positive in the neck window, zero beyond it,
    and bell-shaped (interior maximum)."""
    rho = 0.17  # carbon
    d_end = 2 * rho + 2 * gbn2.PROBE_RADIUS
    assert gbn2.neck_integral(d_end + 0.01, rho, rho) == 0.0
    ds = np.linspace(2 * rho, d_end - 1e-3, 9)
    vals = np.array([gbn2.neck_integral(float(d), rho, rho) for d in ds])
    assert (vals[:-1] >= 0).all() and vals[0] > 0
    k = int(np.argmax(vals))
    assert 0 < k < len(vals) - 1, "maximum should be interior (bell shape)"
    # 1/x^4 weighting: larger atoms put the neck farther from the center,
    # so m0 DECREASES with radius while its position d0 increases
    d0_small, m0_small = gbn2._fit_neck_maximum(0.15, 0.15)
    d0_big, m0_big = gbn2._fit_neck_maximum(0.19, 0.19)
    assert m0_small > m0_big
    assert d0_big > d0_small > 2 * 0.15, "d0 must lie beyond sphere contact"


def test_neck_functional_form_derivative():
    d0, m0 = 0.42, 0.15
    r = jnp.linspace(0.35, 0.6, 50)
    val, dval = gbn2.neck_value_and_derivative(r, d0, m0)
    num = jnp.gradient(val, r[1] - r[0])
    np.testing.assert_allclose(np.asarray(dval)[2:-2], np.asarray(num)[2:-2],
                               rtol=5e-2, atol=1e-3)


@pytest.fixture(scope="module")
def gbn2_system():
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    return build_system(topo, gb_model="gbn2")


def test_gbn2_system_parameters(gbn2_system):
    system, _ = gbn2_system
    assert system.gb_model == "gbn2"
    assert system.gb_offset == pytest.approx(0.0195141)
    assert system.gb_neck_scale == pytest.approx(0.826836)
    # per-element alpha: H and C differ under GBn2
    alpha = np.asarray(system.gb_alpha)
    elems = [n[0] for n in system.atom_names]
    a_by_elem = {e: alpha[i] for i, e in enumerate(elems)}
    assert a_by_elem["H"] == pytest.approx(0.788440)
    assert a_by_elem["C"] == pytest.approx(0.733756)
    # GBn2 screening replaces HCT values (N: 0.733599 vs HCT 0.79)
    screen = np.asarray(system.gb_screen)
    n_idx = [i for i, e in enumerate(elems) if e == "N"][0]
    assert screen[n_idx] == pytest.approx(0.733599)
    assert np.isfinite(np.asarray(system.gb_neck_d0)).all()
    assert (np.asarray(system.gb_neck_m0) >= 0).all()


def test_gbn2_analytic_matches_autodiff(gbn2_system):
    from pmarlo_tpu.md.analytic import energy_and_forces, make_dense_params
    from pmarlo_tpu.md.forces import potential_energy

    system, positions = gbn2_system
    p = make_dense_params(system)
    ea, fa = energy_and_forces(p, positions)
    eg, grad = jax.value_and_grad(lambda x: potential_energy(system, x))(positions)
    scale = float(jnp.max(jnp.abs(grad)))
    assert abs(float(ea) - float(eg)) < 1e-2
    assert float(jnp.max(jnp.abs(fa + grad))) / scale < 1e-5


def test_gbn2_differs_from_obc2(gbn2_system):
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.forces import gb_energy
    from pmarlo_tpu.md.topology import build_topology

    system2, positions = gbn2_system
    topo = build_topology(alanine_dipeptide_structure())
    system1, _ = build_system(topo, gb_model="obc2")
    e1 = float(gb_energy(system1, positions))
    e2 = float(gb_energy(system2, positions))
    assert e1 != pytest.approx(e2, abs=1e-3), "models should differ"
    # both are solvation-stabilizing for a polar molecule
    assert e1 < 0 and e2 < 0


def test_gbn2_neck_term_contributes(gbn2_system):
    """Disabling the neck while keeping everything else changes the
    energy — guards against the neck silently dropping out."""
    import dataclasses

    from pmarlo_tpu.md.forces import gb_energy

    system, positions = gbn2_system
    no_neck = dataclasses.replace(system, gb_neck_scale=0.0)
    e_full = float(gb_energy(system, positions))
    e_nn = float(gb_energy(no_neck, positions))
    assert abs(e_full - e_nn) > 0.1, "neck term has no effect"


def test_shipped_neck_tables_match_generator():
    """The versioned package tables must match what the generator
    produces — guards against stale shipped data after a generator
    change (spot-check of 3 grid points; full regen takes ~2.5 min)."""
    import pmarlo_tpu.md.gbn2 as G

    radii, D0, M0 = G.neck_tables()
    np.testing.assert_allclose(radii, G.TABLE_RADII)
    for i, j in ((0, 0), (10, 10), (4, 16)):
        d0, m0 = G._fit_neck_maximum(float(radii[i]), float(radii[j]))
        assert D0[i, j] == pytest.approx(d0, rel=1e-6)
        assert M0[i, j] == pytest.approx(m0, rel=1e-6)
    # symmetry of the pair tables
    np.testing.assert_allclose(D0, D0.T)
    np.testing.assert_allclose(M0, M0.T)
