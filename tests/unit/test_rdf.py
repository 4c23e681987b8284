"""Radial distribution function: analytic checks + TIP3P water structure.

The slow test is the liquid-structure oracle for the explicit-solvent
engine: equilibrated TIP3P must show the literature O-O first peak
(r ~ 0.28 nm, height ~2.5-3) and first-shell coordination ~4-6 —
properties no finite-trajectory bookkeeping bug can fake (reference
delegates this physics wholesale to OpenMM; see SURVEY §2b).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.features.rdf import coordination_number, radial_distribution


def test_ideal_gas_rdf_is_flat_unity():
    rng = np.random.default_rng(0)
    box = (2.0, 2.0, 2.0)
    x = rng.uniform(0, 2.0, size=(40, 200, 3)).astype(np.float32)
    r, g = radial_distribution(x, box, np.arange(200), r_max=0.95, n_bins=19)
    # skip tiny-r bins (few ideal pairs -> noisy)
    assert np.all(np.abs(g[4:] - 1.0) < 0.15), g
    # total coordination over the full range matches rho * V_sphere
    n = coordination_number(r, g, rho=199 / 8.0, r_cut=0.9)
    expect = 199 / 8.0 * 4 / 3 * np.pi * 0.9**3
    assert abs(n - expect) / expect < 0.1


def test_two_fixed_atoms_single_shell():
    box = (3.0, 3.0, 3.0)
    x = np.zeros((1, 2, 3), np.float32)
    x[0, 1, 0] = 0.5
    r, g = radial_distribution(x, box, np.array([0]), np.array([1]),
                               r_max=1.0, n_bins=50)
    hot = int(np.argmax(g))
    assert abs(r[hot] - 0.5) < 0.02
    assert np.count_nonzero(g) == 1


def test_rmax_beyond_half_box_rejected():
    with pytest.raises(ValueError, match="half the smallest perpendicular"):
        radial_distribution(np.zeros((1, 4, 3)), (1.0, 1.0, 1.0),
                            np.arange(4), r_max=0.6)


def test_cross_species_rdf_shapes():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1.8, size=(5, 60, 3)).astype(np.float32)
    r, g = radial_distribution(x, (1.8, 1.8, 1.8), np.arange(20),
                               np.arange(20, 60), r_max=0.8, n_bins=16)
    assert r.shape == (16,) and g.shape == (16,)
    assert np.isfinite(g).all()


@pytest.mark.slow
def test_tip3p_oo_rdf_matches_literature():
    """5x5x5 TIP3P lattice melted at 300 K must develop the liquid-water
    O-O structure: first peak near 0.28 nm, height in [2.0, 3.6], g -> ~1
    at long range, first-shell coordination in [3.5, 6.5]."""
    from pmarlo_tpu.md.constraints import build_h_constraints
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from tests.unit.test_explicit_solvent import _water_box

    n_side = 5                       # 125 waters
    # 125 waters at ~0.97 g/cm^3 -> L = 1.56 nm
    L = 1.56
    s, _ = _water_box(n_side, spacing=L / n_side, box=L)
    system, x = build_system(s, box=(L, L, L), cutoff=0.7)
    spec = build_h_constraints(system)
    state = thermalize(system, jnp.asarray(x), jax.random.PRNGKey(7), 300.0)
    # melt the lattice + equilibrate: 4 ps at 2 fs, strong coupling
    state, _ = run_md(system, state, n_steps=2000, dt=0.002, friction=5.0,
                      temperature_K=300.0, report_interval=2000,
                      constraints=spec)
    # production: 6 ps, frames every 100 steps
    state, frames = run_md(system, state, n_steps=3000, dt=0.002,
                           friction=1.0, temperature_K=300.0,
                           report_interval=100, constraints=spec)
    pos = np.asarray(frames["positions"])
    assert np.isfinite(pos).all()
    o_idx = np.array([i for i, n in enumerate(system.atom_names)
                      if n == "O"])
    assert o_idx.size == n_side**3
    r, g = radial_distribution(pos, (L, L, L), o_idx, r_max=0.75, n_bins=75)
    peak = int(np.argmax(g))
    assert 0.25 < r[peak] < 0.31, f"first O-O peak at {r[peak]:.3f} nm"
    assert 2.0 < g[peak] < 3.6, f"first-peak height {g[peak]:.2f}"
    # long-range normalization: mean g over 0.6-0.75 nm ~ 1
    tail = g[(r > 0.6)]
    assert abs(float(tail.mean()) - 1.0) < 0.25, tail.mean()
    n_coord = coordination_number(r, g, rho=n_side**3 / L**3, r_cut=0.35)
    assert 3.5 < n_coord < 6.5, f"coordination {n_coord:.2f}"


def test_overlapping_selections_match_default():
    """idx_b equal to idx_a by value must agree with the idx_b=None
    spelling: self-pairs excluded, partner density discounted."""
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 2.0, size=(6, 80, 3)).astype(np.float32)
    ia = np.arange(80)
    r1, g1 = radial_distribution(x, (2.0, 2.0, 2.0), ia, r_max=0.9, n_bins=18)
    r2, g2 = radial_distribution(x, (2.0, 2.0, 2.0), ia, ia,
                                 r_max=0.9, n_bins=18)
    np.testing.assert_allclose(g1, g2, rtol=1e-6)
