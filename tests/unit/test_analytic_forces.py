"""Analytic (manual-derivative) forces must match autodiff exactly.

This is the correctness gate for the fused TPU kernel path: every term in
md/analytic.py is checked against jax.grad of md/forces.py.
"""

import jax
import numpy as np
import pytest

from pmarlo_tpu.md.analytic import energy_and_forces, make_dense_params
from pmarlo_tpu.md.forces import compute_forces, potential_energy


def _check(system, positions, tol=1e-4):
    dense = make_dense_params(system)
    e_ref = float(potential_energy(system, positions))
    f_ref = np.asarray(compute_forces(system, positions))
    e, f = energy_and_forces(dense, positions)
    scale = max(np.abs(f_ref).max(), 1.0)
    assert abs(float(e) - e_ref) / max(abs(e_ref), 1.0) < tol
    assert np.abs(np.asarray(f) - f_ref).max() / scale < tol


@pytest.mark.slow
def test_alanine_matches_autodiff(alanine_system):
    system, positions, _ = alanine_system
    _check(system, positions)


@pytest.mark.slow
def test_perturbed_configurations_match(alanine_system):
    system, positions, _ = alanine_system
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    for i in range(3):
        x = positions + jnp.asarray(
            rng.normal(0, 0.01, positions.shape), positions.dtype
        )
        _check(system, x)


@pytest.mark.slow
def test_chignolin_matches_autodiff():
    from pmarlo_tpu.data import chignolin_path
    from pmarlo_tpu.io.pdb import read_pdb
    from pmarlo_tpu.md.forcefield import build_system

    path = chignolin_path()
    if path is None:
        pytest.skip("no chignolin PDB on this host")
    system, positions = build_system(read_pdb(path, model=1))
    _check(system, positions)


def test_vacuum_system_matches(alanine_system):
    """use_gb=False branch."""
    import dataclasses

    system, positions, _ = alanine_system
    vac = dataclasses.replace(system, use_gb=False)
    _check(vac, positions)


def test_force_fn_integrates(alanine_system):
    """The analytic force path drives identical-quality dynamics."""
    import jax.numpy as jnp

    from pmarlo_tpu.md.integrate import make_force_fn, run_md, thermalize

    system, positions, _ = alanine_system
    state = thermalize(system, positions, jax.random.PRNGKey(0), 300.0)
    fn = make_force_fn(system, analytic=True)
    final, frames = run_md(
        system, state, n_steps=500, dt=0.002, friction=1.0,
        temperature_K=300.0, report_interval=100, force_fn=fn,
    )
    assert np.isfinite(np.asarray(final.positions)).all()
    assert 100 < float(np.asarray(frames["temperature"]).mean()) < 500
