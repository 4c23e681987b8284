"""MSD / diffusion: analytic checks + TIP3P self-diffusion oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.features.msd import (
    diffusion_coefficient,
    mean_squared_displacement,
    unwrap_trajectory,
)


def test_unwrap_recovers_straight_line():
    """An atom drifting at constant velocity through a periodic box
    unwraps to an exact straight line."""
    box = (1.0, 1.0, 1.0)
    t = np.arange(50, dtype=np.float32)
    true = np.stack([0.07 * t, 0.03 * t, np.zeros_like(t)], axis=-1)
    wrapped = np.mod(true, 1.0)[:, None, :]
    unwrapped = np.asarray(unwrap_trajectory(wrapped, box))[:, 0]
    np.testing.assert_allclose(unwrapped - unwrapped[0],
                               true - true[0], atol=1e-5)


@pytest.mark.slow
def test_ballistic_msd_quadratic():
    """Constant-velocity atoms: MSD(t) = |v|^2 t^2 exactly."""
    t = np.arange(30, dtype=np.float32)
    v = np.array([0.2, -0.1, 0.05], np.float32)
    x = (t[:, None, None] * v[None, None, :]).repeat(4, axis=1)
    lags, msd = mean_squared_displacement(x)
    expect = np.sum(v**2) * lags.astype(float) ** 2
    np.testing.assert_allclose(msd, expect, rtol=1e-4)


@pytest.mark.slow
def test_random_walk_diffusion_recovered():
    """Discrete 3D Gaussian random walk: D = sigma^2/(2 dt) per axis,
    MSD slope = 6D. Recover D within 15%."""
    rng = np.random.default_rng(5)
    sigma = 0.03
    steps = rng.normal(0, sigma, size=(400, 64, 3)).astype(np.float32)
    x = np.cumsum(steps, axis=0)
    lags, msd = mean_squared_displacement(x, max_lag=80)
    d = diffusion_coefficient(lags, msd, dt_per_lag_ps=1.0)
    d_true = 3 * sigma**2 / 6.0  # slope = 3 sigma^2 per unit lag -> /6
    assert abs(d - d_true) / d_true < 0.15, (d, d_true)


@pytest.mark.slow
def test_tip3p_self_diffusion_matches_model():
    """TIP3P oxygen self-diffusion from a melted 125-water box must land
    in the model's literature range (TIP3P runs hot: D ~ 5-6e-5 cm^2/s;
    accept [2.5, 13]e-5 for a short small-box RF run). COM motion must
    be removed: the Langevin thermostat random-walks the box COM at
    kT/(M*friction) ~ 2e-5 cm^2/s here — same order as the signal."""
    from pmarlo_tpu.md.constraints import build_h_constraints
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from tests.unit.test_explicit_solvent import _water_box

    n_side, L = 5, 1.56
    s, _ = _water_box(n_side, spacing=L / n_side, box=L)
    system, x = build_system(s, box=(L, L, L), cutoff=0.7)
    spec = build_h_constraints(system)
    state = thermalize(system, jnp.asarray(x), jax.random.PRNGKey(11), 300.0)
    # melt + equilibrate 8 ps (PE/water converges to ~-34.5 kJ/mol by
    # ~6 ps from the lattice start; -40.5 with Ewald/tail corrections)
    state, _ = run_md(system, state, n_steps=4000, dt=0.002, friction=2.0,
                      temperature_K=300.0, report_interval=4000,
                      constraints=spec)
    # production: moderate coupling so the thermostat neither damps
    # transport nor dominates it with COM noise
    state, frames = run_md(system, state, n_steps=5000, dt=0.002,
                           friction=0.5, temperature_K=300.0,
                           report_interval=50, constraints=spec)
    pos = np.asarray(frames["positions"])
    o_idx = np.array([i for i, n in enumerate(system.atom_names)
                      if n == "O"])
    lags, msd = mean_squared_displacement(
        pos, (L, L, L), o_idx, max_lag=60,
        remove_com=True, masses=np.asarray(system.masses),
    )
    d_nm2_ps = diffusion_coefficient(lags, msd, dt_per_lag_ps=0.1)
    d_cm2_s = d_nm2_ps * 1e-2
    assert 2.5e-5 < d_cm2_s < 13e-5, f"TIP3P D = {d_cm2_s:.2e} cm^2/s"


def test_single_frame_returns_trivial_lag():
    lags, msd = mean_squared_displacement(np.zeros((1, 5, 3), np.float32))
    assert list(lags) == [0] and list(msd) == [0.0]
    lags, msd = mean_squared_displacement(
        np.zeros((10, 5, 3), np.float32), max_lag=0)
    assert list(lags) == [0] and list(msd) == [0.0]
