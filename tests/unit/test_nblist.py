"""Neighbor-list nonbonded/GB path: dense parity, exclusions, MD driver.

The parity gate: with a cutoff beyond the system extent the neighbor path
must reproduce the dense O(N^2) path to f32 roundoff for BOTH solvent
models, energies and forces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.md import nblist as NB
from pmarlo_tpu.md.forces import potential_energy


@pytest.fixture(scope="module", params=["obc2", "gbn2"])
def system_and_positions(request):
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    return build_system(topo, gb_model=request.param)


@pytest.mark.slow
def test_dense_parity_energy_forces(system_and_positions):
    system, x = system_and_positions
    nl = NB.build_neighbor_list(x, cutoff=50.0, capacity=system.n_atoms)
    t = NB.make_exclusion_tables(system)
    e_nb = float(NB.potential_energy_nb(system, x, nl, t))
    e_dense = float(potential_energy(system, x))
    assert abs(e_nb - e_dense) < 5e-3
    g_nb = jax.grad(lambda p: NB.potential_energy_nb(system, p, nl, t))(x)
    g_d = jax.grad(lambda p: potential_energy(system, p))(x)
    assert float(jnp.max(jnp.abs(g_nb - g_d))) < 5e-3


def test_neighbor_list_structure(system_and_positions):
    system, x = system_and_positions
    n = system.n_atoms
    # capacity >= actual neighbor count: symmetry is only guaranteed
    # without saturation (test_overflow_is_reported covers saturation)
    nl = NB.build_neighbor_list(x, cutoff=0.5, capacity=n)
    assert int(nl.n_max) <= n
    cap = nl.idx.shape[1]
    assert nl.idx.shape == (n, cap)
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    # valid slots hold real neighbors within the cutoff, both directions
    pos = np.asarray(x)
    pairs = set()
    for i in range(n):
        for s in range(cap):
            if mask[i, s]:
                j = int(idx[i, s])
                assert j != i
                assert np.linalg.norm(pos[i] - pos[j]) < 0.5
                pairs.add((i, j))
    for i, j in list(pairs):
        assert (j, i) in pairs, "list must be direction-symmetric"
    # masked slots are self-padded (in-bounds gathers)
    assert (idx[mask == 0] == np.nonzero(mask == 0)[0]).all()


def test_overflow_is_reported(system_and_positions):
    system, x = system_and_positions
    nl = NB.build_neighbor_list(x, cutoff=50.0, capacity=4)
    assert int(nl.n_max) > 4  # more neighbors exist than capacity


def test_exclusion_tables_match_scale_matrices(system_and_positions):
    """The per-atom tables must encode exactly the dense scale matrices
    (which are themselves tested against amber conventions)."""
    system, _ = system_and_positions
    t = NB.make_exclusion_tables(system)
    n = system.n_atoms
    se_dense = np.asarray(system.scale_elec)
    sl_dense = np.asarray(system.scale_lj)
    partner = np.asarray(t.partner)
    s_el = np.asarray(t.scale_el)
    s_lj = np.asarray(t.scale_lj)
    rebuilt_se = np.ones((n, n))
    rebuilt_sl = np.ones((n, n))
    np.fill_diagonal(rebuilt_se, 0.0)
    np.fill_diagonal(rebuilt_sl, 0.0)
    for i in range(n):
        for s in range(partner.shape[1]):
            j = partner[i, s]
            if j >= 0:
                rebuilt_se[i, j] = s_el[i, s]
                rebuilt_sl[i, j] = s_lj[i, s]
    np.testing.assert_allclose(rebuilt_se, se_dense, atol=1e-6)
    np.testing.assert_allclose(rebuilt_sl, sl_dense, atol=1e-6)


@pytest.mark.slow
def test_run_md_nb_stable(system_and_positions):
    from pmarlo_tpu.md.integrate import thermalize
    from pmarlo_tpu.md.minimize import minimize_energy

    system, x = system_and_positions
    xmin, _ = minimize_energy(system, x)
    st = thermalize(system, xmin, jax.random.PRNGKey(1), 300.0)
    st, rep = NB.run_md_nb(system, st, n_steps=400, dt=0.002, friction=1.0,
                           temperature_K=300.0, report_interval=100,
                           cutoff=1.2, rebuild_interval=20)
    assert np.isfinite(np.asarray(rep["positions"])).all()
    assert 150.0 < float(np.asarray(rep["temperature"])[-1]) < 450.0


def test_run_md_nb_validates_intervals(system_and_positions):
    from pmarlo_tpu.md.integrate import thermalize

    system, x = system_and_positions
    st = thermalize(system, x, jax.random.PRNGKey(0), 300.0)
    with pytest.raises(ValueError, match="rebuild_interval"):
        NB.run_md_nb(system, st, n_steps=100, dt=0.002, friction=1.0,
                     temperature_K=300.0, report_interval=100,
                     rebuild_interval=33)
