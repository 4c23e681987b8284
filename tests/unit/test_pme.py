"""Smooth-PME validation: Madelung constant, spline partition of unity,
force consistency, and the measured RF-vs-Ewald delta on a water box
(VERDICT r2 next-round item #3)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 as KE
from pmarlo_tpu.md.pme import (
    ewald_alpha,
    ewald_energy_dense,
    pme_grid_shape,
    reciprocal_energy,
    self_energy,
    spread_charges,
)

MADELUNG_NACL = 1.747564594  # rocksalt, standard value


def _rocksalt(n_side=6, d=0.30):
    """Alternating +/- charges on a simple cubic lattice = NaCl."""
    idx = np.arange(n_side)
    ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
    x = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3) * d + d / 2
    q = ((-1.0) ** (ii + jj + kk)).reshape(-1)
    L = n_side * d
    return (jnp.asarray(x, jnp.float32), jnp.asarray(q, jnp.float32),
            (L, L, L))


def test_spline_partition_of_unity():
    """Spread charges must land on the mesh with total = total charge
    for ANY positions (M4 splines sum to 1)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 4, (50, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=50), jnp.float32)
    grid = spread_charges(x, q, (3.0, 3.0, 3.0), (24, 24, 24))
    np.testing.assert_allclose(float(grid.sum()), float(q.sum()), atol=1e-4)


def test_madelung_constant():
    """Full PME energy of the NaCl lattice must reproduce the Madelung
    constant — the analytic oracle for Ewald implementations."""
    x, q, box = _rocksalt(6, d=0.30)
    e = float(ewald_energy_dense(x, q, box, cutoff=0.85))
    n_ions = x.shape[0]
    # E_total = -N * M * ke * q^2 / (2 d)
    M_est = -e * 2.0 * 0.30 / (n_ions * KE)
    assert abs(M_est - MADELUNG_NACL) < 5e-3, M_est


def test_madelung_alpha_independence():
    """The split between real and reciprocal space must not change the
    total: two alphas, same energy."""
    x, q, box = _rocksalt(6, d=0.30)
    e1 = float(ewald_energy_dense(x, q, box, cutoff=0.85,
                                  alpha=ewald_alpha(0.85)))
    e2 = float(ewald_energy_dense(x, q, box, cutoff=0.85,
                                  alpha=ewald_alpha(0.85) * 1.25))
    assert abs(e1 - e2) < 2e-3 * abs(e1), (e1, e2)


@pytest.mark.slow
def test_pme_force_consistency():
    """Autodiff PME forces must match finite differences of the energy
    (the reference's FD oracle pattern, tests/force/)."""
    x, q, box = _rocksalt(4, d=0.30)
    x = x.at[0].add(jnp.asarray([0.03, -0.02, 0.05]))

    def energy(p):
        return ewald_energy_dense(p, q, box, cutoff=0.55)

    g = jax.grad(energy)(x)
    h = 1e-3
    for comp in range(3):
        dx = jnp.zeros_like(x).at[0, comp].add(h)
        fd = (float(energy(x + dx)) - float(energy(x - dx))) / (2 * h)
        assert abs(fd - float(g[0, comp])) < max(0.05 * abs(fd), 0.5), (
            comp, fd, float(g[0, comp])
        )


def test_self_energy_sign():
    q = jnp.asarray([1.0, -1.0, 0.5], jnp.float32)
    assert float(self_energy(q, 3.0)) < 0.0


def test_rf_vs_pme_delta_documented():
    """Reaction field is a documented approximation: measure its
    energy deviation from Ewald on a TIP3P-like box. The delta must be
    small relative to the total electrostatics but nonzero (else one of
    the two paths is broken)."""
    rng = np.random.default_rng(3)
    # random neutral box of point dipoles (O at -0.8, 2 H at +0.4 offset)
    n_w = 60
    L = 1.8
    centers = rng.uniform(0, L, (n_w, 3))
    x, q = [], []
    for c in centers:
        x.append(c)
        q.append(-0.834)
        for _ in range(2):
            x.append(c + rng.normal(0, 0.06, 3))
            q.append(0.417)
    x = jnp.asarray(np.asarray(x), jnp.float32)
    q = jnp.asarray(np.asarray(q), jnp.float32)
    box = (L, L, L)
    rc = 0.85

    e_pme = float(ewald_energy_dense(x, q, box, cutoff=rc))

    # reaction-field reference (same convention as the periodic kernel)
    eps_rf = 78.5
    k_rf = (eps_rf - 1.0) / ((2.0 * eps_rf + 1.0) * rc**3)
    c_rf = 1.0 / rc + k_rf * rc * rc
    d = x[:, None, :] - x[None, :, :]
    Lv = jnp.asarray(box, jnp.float32)
    d = d - Lv * jnp.round(d / Lv)
    r2 = jnp.sum(d * d, axis=-1)
    n = x.shape[0]
    eye = jnp.eye(n)
    r = jnp.sqrt(jnp.where(r2 > 1e-12, r2, 1.0))
    within = (r < rc).astype(jnp.float32) * (1 - eye)
    e_rf = float(0.5 * jnp.sum(
        KE * q[:, None] * q[None, :] * (1.0 / r + k_rf * r * r - c_rf) * within
    ))
    delta = abs(e_pme - e_rf)
    assert delta > 1e-3            # genuinely different physics
    assert delta < 0.2 * abs(e_pme), (e_pme, e_rf)


def test_grid_shape_rounding():
    s = pme_grid_shape((3.0018, 2.8549, 2.6764))
    assert all(k % 8 == 0 and k >= 16 for k in s)


@pytest.mark.slow
def test_order6_splines_partition_and_accuracy():
    """General-order B-spline weights: partition of unity, integer-point
    values via the Cox-de Boor recursion, and order-6 on the coarser
    default mesh beating order-4/0.11 nm against a tight reference."""
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.md.pme import (
        SPACING_BY_ORDER,
        _bspline_weights,
        _mn_integer,
        ewald_alpha,
        pme_grid_shape,
        reciprocal_energy,
    )

    t = jnp.asarray(np.random.default_rng(1).uniform(0, 1, 64), jnp.float32)
    for order in (4, 5, 6):
        s = np.asarray(_bspline_weights(t, order)).sum(axis=-1)
        np.testing.assert_allclose(s, 1.0, atol=5e-6)
    # M6 at the integers (known closed-form values /120)
    np.testing.assert_allclose(
        _mn_integer(6), np.array([1, 26, 66, 26, 1]) / 120.0, atol=1e-12
    )

    N, L = 400, 2.5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, L, (N, 3)), jnp.float32)
    qn = rng.normal(0, 0.4, N)
    q = jnp.asarray(qn - qn.mean(), jnp.float32)
    box = (L, L, L)
    alpha = ewald_alpha(0.9)

    def grad_rms_err(order, spacing, ref):
        shape = pme_grid_shape(box, spacing)
        g = jax.grad(
            lambda p: reciprocal_energy(p, q, box, alpha, shape, order)
        )(x)
        return float(np.sqrt(np.mean((np.asarray(g) - ref) ** 2)))

    g_ref = jax.grad(
        lambda p: reciprocal_energy(p, q, box, alpha,
                                    pme_grid_shape(box, 0.05), 6)
    )(x)
    g_ref = np.asarray(g_ref)
    err6 = grad_rms_err(6, SPACING_BY_ORDER[6], g_ref)
    err4 = grad_rms_err(4, SPACING_BY_ORDER[4], g_ref)
    assert err6 < err4, (err6, err4)
