"""Force correctness: analytic (jax.grad) vs finite differences.

This is the reference's key numerical oracle
(tests/force/test_fd_vs_torchforce.py:25-84: RMS(analytic - FD) small),
applied to the whole potential rather than just the bias term.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.md.forces import (
    compute_forces,
    energy_components,
    potential_energy,
)


def _fd_forces(system, positions, eps=1e-4):
    pos = np.asarray(positions, dtype=np.float64)
    f = np.zeros_like(pos)
    for i in range(pos.shape[0]):
        for d in range(3):
            p_plus = pos.copy()
            p_plus[i, d] += eps
            p_minus = pos.copy()
            p_minus[i, d] -= eps
            e_plus = float(potential_energy(system, jnp.asarray(p_plus, jnp.float32)))
            e_minus = float(potential_energy(system, jnp.asarray(p_minus, jnp.float32)))
            f[i, d] = -(e_plus - e_minus) / (2 * eps)
    return f


def test_forces_match_finite_differences(alanine_system):
    system, positions, _ = alanine_system
    analytic = np.asarray(compute_forces(system, positions))
    fd = _fd_forces(system, positions)
    scale = max(np.abs(fd).max(), 1.0)
    rms = np.sqrt(((analytic - fd) ** 2).mean()) / scale
    # f32 energies through a central difference: relative RMS well under 1%
    assert rms < 1e-2, f"relative RMS force error {rms:.2e}"


def test_energy_components_finite(alanine_system):
    system, positions, _ = alanine_system
    comps = energy_components(system, positions)
    for name, value in comps.items():
        assert np.isfinite(float(value)), f"{name} not finite"
    assert float(comps["gb"]) < 0  # solvation of a polar solute is favorable


def test_bias_composition_changes_energy_and_forces(alanine_system):
    system, positions, _ = alanine_system
    bias = lambda x: 10.0 * jnp.sum((x[0] - x[-1]) ** 2)
    e0 = float(potential_energy(system, positions))
    e1 = float(potential_energy(system, positions, bias_fn=bias))
    assert e1 > e0
    f0 = np.asarray(compute_forces(system, positions))
    f1 = np.asarray(compute_forces(system, positions, bias_fn=bias))
    assert not np.allclose(f0[0], f1[0])
    assert np.allclose(f0[5], f1[5], atol=1e-4)  # untouched atom


def test_translation_invariance(alanine_system):
    system, positions, _ = alanine_system
    shifted = positions + jnp.asarray([1.0, -2.0, 0.5])
    e0 = float(potential_energy(system, positions))
    e1 = float(potential_energy(system, shifted))
    assert abs(e0 - e1) < 5e-3 * max(abs(e0), 1.0)


def test_rotation_invariance(alanine_system):
    system, positions, _ = alanine_system
    theta = 0.7
    R = jnp.asarray(
        [[np.cos(theta), -np.sin(theta), 0.0],
         [np.sin(theta), np.cos(theta), 0.0],
         [0.0, 0.0, 1.0]], dtype=jnp.float32,
    )
    e0 = float(potential_energy(system, positions))
    e1 = float(potential_energy(system, positions @ R.T))
    assert abs(e0 - e1) < 5e-3 * max(abs(e0), 1.0)
