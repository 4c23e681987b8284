"""Integrator and minimizer behavior."""

import jax
import numpy as np
import pytest

from pmarlo_tpu.md.integrate import (
    instantaneous_temperature,
    run_md,
    thermalize,
)
from pmarlo_tpu.md.minimize import minimize_energy
from pmarlo_tpu.md.forces import potential_energy


def test_minimize_reduces_energy(alanine_system):
    system, positions, _ = alanine_system
    x_min, e_min = minimize_energy(system, positions, max_iterations=300)
    e0 = float(potential_energy(system, positions))
    assert float(e_min) < e0
    assert np.isfinite(np.asarray(x_min)).all()


@pytest.mark.slow
def test_md_stays_finite_and_thermalizes(alanine_system):
    system, positions, _ = alanine_system
    x_min, _ = minimize_energy(system, positions, max_iterations=200)
    state = thermalize(system, x_min, jax.random.PRNGKey(1), 300.0)
    final, frames = run_md(
        system, state, n_steps=2000, dt=0.002, friction=1.0,
        temperature_K=300.0, report_interval=100,
    )
    temps = np.asarray(frames["temperature"])
    assert np.isfinite(np.asarray(final.positions)).all()
    # 22 atoms: sigma(T) ~ 55 K; mean over 20 samples within ~4 sigma/sqrt(20)
    assert 180 < temps[5:].mean() < 420


def test_md_reproducible_same_seed(alanine_system):
    system, positions, _ = alanine_system
    runs = []
    for _ in range(2):
        state = thermalize(system, positions, jax.random.PRNGKey(7), 300.0)
        final, _ = run_md(
            system, state, n_steps=200, dt=0.002, friction=1.0,
            temperature_K=300.0, report_interval=100,
        )
        runs.append(np.asarray(final.positions))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_run_md_validates_report_interval(alanine_system):
    system, positions, _ = alanine_system
    state = thermalize(system, positions, jax.random.PRNGKey(0), 300.0)
    with pytest.raises(ValueError, match="multiple"):
        run_md(system, state, n_steps=150, dt=0.002, friction=1.0,
               temperature_K=300.0, report_interval=100)


def _ala_pdb(tmp_path):
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.io.pdb import write_pdb

    s = alanine_dipeptide_structure()
    pdb = tmp_path / "ala.pdb"
    write_pdb(
        pdb, s.coordinates(),
        [a.name for r in s.residues for a in r.atoms],
        [a.resname for r in s.residues for a in r.atoms],
        [a.resid for r in s.residues for a in r.atoms],
    )
    return pdb


@pytest.mark.slow
def test_run_segment_nve_conserves_energy(tmp_path):
    """ensemble='nve': zero-friction BAOAB == velocity Verlet; the
    total_energy trace must be flat (exact-gradient guardrail)."""
    from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
    from pmarlo_tpu.md.simulation import run_segment

    res = run_segment(
        _ala_pdb(tmp_path), n_steps=600, report_interval=100,
        dt_ps=0.001, temperature_K=300.0, ensemble="nve",
        minimize_iterations=300, seed=3,
    )
    e = np.asarray(res["total_energy"])
    assert e.shape == (6,)
    assert np.isfinite(e).all()
    n_dof = 3 * res["system"].n_atoms - 3
    kt = BOLTZMANN_CONSTANT_KJ_PER_MOL * 300.0
    drift = abs(float(e[-1] - e[0])) / (n_dof * kt)
    # 0.6 ps of velocity Verlet at 1 fs on minimized alanine: total
    # energy moves < 2% of kT per dof (a sign/half-kick bug reads ~1)
    assert drift < 0.02, f"NVE drift {drift:.4f} kT/dof over 0.6 ps"


def test_run_segment_rejects_unknown_ensemble(tmp_path):
    from pmarlo_tpu.md.simulation import run_segment

    with pytest.raises(ValueError, match="ensemble"):
        run_segment(_ala_pdb(tmp_path), n_steps=100, report_interval=100,
                    ensemble="nvk")


@pytest.mark.slow
def test_run_segment_resume_from_final_state(tmp_path):
    """initial_state= continues dynamics: no re-minimize/re-thermalize,
    and the chained run picks up exactly where the first ended."""
    from pmarlo_tpu.md.simulation import run_segment

    pdb = _ala_pdb(tmp_path)
    first = run_segment(pdb, n_steps=200, report_interval=100,
                        dt_ps=0.001, seed=5)
    resumed = run_segment(pdb, n_steps=200, report_interval=100,
                          dt_ps=0.001,
                          initial_state=first["final_state"])
    assert np.isnan(resumed["minimized_energy"])
    assert np.isfinite(np.asarray(resumed["positions"])).all()
    # continuity: the resumed start equals the first run's end, so one
    # chained 400-step run from the same state reproduces it exactly
    # (seed=None on resume = pure continuation of the PRNG stream)
    chained = run_segment(pdb, n_steps=400, report_interval=100,
                          dt_ps=0.001,
                          initial_state=first["final_state"])
    np.testing.assert_allclose(
        np.asarray(resumed["positions"][-1]),
        np.asarray(chained["positions"][1]), atol=1e-6)


@pytest.mark.slow
def test_resume_branching_seeds_decorrelate(tmp_path):
    """N walkers branched from one checkpoint with different seeds must
    draw DIFFERENT noise (seed folds into the checkpoint key); the same
    seed reproduces the same branch."""
    from pmarlo_tpu.md.simulation import run_segment

    pdb = _ala_pdb(tmp_path)
    ckpt = run_segment(pdb, n_steps=100, report_interval=100,
                       dt_ps=0.001, seed=5)["final_state"]
    w1 = run_segment(pdb, n_steps=100, report_interval=100, dt_ps=0.001,
                     seed=1, initial_state=ckpt)
    w2 = run_segment(pdb, n_steps=100, report_interval=100, dt_ps=0.001,
                     seed=2, initial_state=ckpt)
    w1b = run_segment(pdb, n_steps=100, report_interval=100, dt_ps=0.001,
                      seed=1, initial_state=ckpt)
    assert not np.allclose(np.asarray(w1["positions"][-1]),
                           np.asarray(w2["positions"][-1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1["positions"][-1]),
                               np.asarray(w1b["positions"][-1]), atol=0.0)


def test_resume_rejects_result_dict(tmp_path):
    """Passing the whole result dict (instead of ['final_state']) must
    raise the explanatory error, not an AttributeError in jitted code."""
    from pmarlo_tpu.md.simulation import run_segment

    pdb = _ala_pdb(tmp_path)
    first = run_segment(pdb, n_steps=100, report_interval=100, dt_ps=0.001)
    with pytest.raises(ValueError, match="MDState"):
        run_segment(pdb, n_steps=100, report_interval=100,
                    initial_state=first)


def test_run_segment_resume_rejects_wrong_system(tmp_path):
    from pmarlo_tpu.md.integrate import MDState
    from pmarlo_tpu.md.simulation import run_segment

    import jax.numpy as jnp
    bad = MDState(positions=jnp.zeros((7, 3)), velocities=jnp.zeros((7, 3)),
                  key=jax.random.PRNGKey(0), step=jnp.asarray(0))
    with pytest.raises(ValueError, match="resume states"):
        run_segment(_ala_pdb(tmp_path), n_steps=100, report_interval=100,
                    initial_state=bad)


def test_run_md_rejects_force_fn_plus_bias_fn(alanine_system):
    """The ambiguous combination must refuse, not silently drop the bias."""
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.md.integrate import make_force_fn, run_md, thermalize

    system, positions, _ = alanine_system
    fn = make_force_fn(system, None, analytic=True)
    st = thermalize(system, jnp.asarray(positions), jax.random.PRNGKey(0),
                    300.0)
    with pytest.raises(ValueError, match="not both"):
        run_md(system, st, n_steps=10, dt=0.001, friction=1.0,
               temperature_K=300.0, report_interval=10,
               force_fn=fn, bias_fn=lambda x: jnp.sum(x**2))


@pytest.mark.slow
def test_run_md_cache_reuses_self_built_force_fn(alanine_system):
    """Dense-path segment chaining (force_fn=None) must hit the compile
    cache on the second call — keying on the fresh closure's id() would
    recompile every segment."""
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.md.integrate import _RUN_MD_CACHE, run_md, thermalize

    system, positions, _ = alanine_system
    st = thermalize(system, jnp.asarray(positions), jax.random.PRNGKey(1),
                    300.0)
    _RUN_MD_CACHE.clear()
    run_md(system, st, n_steps=20, dt=0.0005, friction=1.0,
           temperature_K=300.0, report_interval=20)
    assert len(_RUN_MD_CACHE) == 1
    run_md(system, st, n_steps=20, dt=0.0005, friction=1.0,
           temperature_K=300.0, report_interval=20)
    assert len(_RUN_MD_CACHE) == 1, "second identical call missed the cache"


def test_nve_temperature_and_total_energy_conventions(tmp_path):
    """The NVE reporter and the total-energy reconstruction must use the
    SAME dof convention (3N - 3: COM momentum is conserved at zero), or
    total_energy = PE + KE*(wrong ratio) shows spurious KE-correlated
    noise. Verified directly: KE recomputed from the final state's
    synchronized velocities matches the reported temperature under the
    remove_com convention."""
    import jax

    from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
    from pmarlo_tpu.md.integrate import (
        instantaneous_temperature,
        kinetic_energy,
    )
    from pmarlo_tpu.md.simulation import run_segment

    res = run_segment(
        _ala_pdb(tmp_path), n_steps=200, report_interval=100,
        dt_ps=0.001, temperature_K=300.0, ensemble="nve",
        minimize_iterations=150, seed=5,
    )
    system = res["system"]
    n_dof = 3 * system.n_atoms - 3
    # total_energy inverts the reported T with the SAME dof count
    ke = 0.5 * n_dof * BOLTZMANN_CONSTANT_KJ_PER_MOL * np.asarray(
        res["temperature"]
    )
    np.testing.assert_allclose(
        np.asarray(res["total_energy"]),
        np.asarray(res["potential_energy"]) + ke, rtol=1e-6,
    )
    # the remove_com convention itself: T = 2 KE / ((3N-3) kB)
    v = res["final_state"].velocities
    t_conv = float(instantaneous_temperature(system, v, 0, remove_com=True))
    t_manual = float(
        2.0 * kinetic_energy(system, v)
        / (n_dof * BOLTZMANN_CONSTANT_KJ_PER_MOL)
    )
    assert abs(t_conv - t_manual) < 1e-6
