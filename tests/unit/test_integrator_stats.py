"""Equilibrium-statistics regression tests for the Langevin integrator.

Guards against kick-size bugs: the folded BAOAB scheme must apply a FULL
dt kick per step (OpenMM LangevinMiddle protocol, reference
src/pmarlo/simulation/__init__.py:73-77). A half-dt kick integrates F/2 and
samples exp(-U/2kT) — the harmonic-oscillator configurational variance then
measures 2x kT/k, which these tests catch at >20 sigma.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import pytest

from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
from pmarlo_tpu.md.integrate import MDState, langevin_step


def _scan_steps(system, state, n_steps, **kw):
    def step(s, _):
        s, _ = langevin_step(system, s, **kw)
        return s, (s.positions, s.velocities)

    return jax.lax.scan(step, state, None, length=n_steps)


@pytest.mark.slow
def test_harmonic_oscillator_configurational_variance():
    """<x^2> == kT/k for a particle in a harmonic well (BAOAB invariant)."""
    k_spring = 100.0  # kJ/mol/nm^2
    mass = 10.0       # amu
    temperature = 300.0
    dt = 0.002        # ps; omega*dt ~ 0.006, discretization bias negligible
    friction = 5.0    # near-critical damping for fast decorrelation
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * temperature
    n_particles = 32  # independent wells: 32x the effective sample count

    system = SimpleNamespace(
        masses=jnp.full((n_particles,), mass, jnp.float32)
    )

    def force_fn(x):
        return 0.5 * k_spring * jnp.sum(x * x), -k_spring * x

    state = MDState(
        positions=jnp.zeros((n_particles, 3), jnp.float32),
        velocities=jnp.zeros((n_particles, 3), jnp.float32),
        key=jax.random.PRNGKey(7),
        step=jnp.asarray(0, jnp.int32),
    )

    run = jax.jit(
        lambda s: _scan_steps(
            system, s, 100_000,
            dt=dt, friction=friction, temperature_K=temperature,
            force_fn=force_fn,
        )
    )
    _, (xs, vs) = run(state)
    xs = xs[10_000:]  # discard burn-in
    vs = vs[10_000:]

    var_x = float(jnp.mean(xs**2))
    expected_x = kT / k_spring
    assert abs(var_x - expected_x) / expected_x < 0.10, (
        f"<x^2>={var_x:.5f} vs kT/k={expected_x:.5f} "
        f"(ratio {var_x / expected_x:.3f}; a half-kick bug gives ~2.0)"
    )

    # velocity marginal: <v^2> == kT/m per dof (O(dt^2) discretization)
    var_v = float(jnp.mean(vs**2))
    expected_v = kT / mass
    assert abs(var_v - expected_v) / expected_v < 0.10


def test_free_particle_velocity_ou_exact():
    """With zero force the O-step is an exact OU process: <v^2> = kT/m."""
    mass = 2.0
    temperature = 250.0
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * temperature
    system = SimpleNamespace(masses=jnp.array([mass], jnp.float32))

    def force_fn(x):
        return jnp.zeros(()), jnp.zeros_like(x)

    state = MDState(
        positions=jnp.zeros((1, 3), jnp.float32),
        velocities=jnp.zeros((1, 3), jnp.float32),
        key=jax.random.PRNGKey(3),
        step=jnp.asarray(0, jnp.int32),
    )
    run = jax.jit(
        lambda s: _scan_steps(
            system, s, 100_000,
            dt=0.004, friction=2.0, temperature_K=temperature,
            force_fn=force_fn,
        )
    )
    _, (_, vs) = run(state)
    var_v = float(jnp.mean(vs[10_000:] ** 2))
    assert abs(var_v - kT / mass) / (kT / mass) < 0.10
