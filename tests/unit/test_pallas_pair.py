"""Tiled pair-stage kernel: interpret-mode parity vs the dense path.

Unlike the small-system fused kernel (whose Mosaic PRNG cannot run on
CPU), this kernel is PRNG-free, so ``interpret=True`` exercises the full
kernel logic — tiling, masking, padding, class-matmul neck lookups — on
the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.md.forces import potential_energy
from pmarlo_tpu.md.pallas_pair import build_pair_force_fn


@pytest.fixture(scope="module", params=["obc2", "gbn2"])
def system_and_positions(request):
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    return build_system(topo, gb_model=request.param)


@pytest.mark.slow
def test_pair_kernel_dense_parity(system_and_positions):
    system, x = system_and_positions
    fn = build_pair_force_fn(system, tile=128, interpret=True)
    e, f = fn(x)
    e_d, g_d = jax.value_and_grad(lambda p: potential_energy(system, p))(x)
    assert abs(float(e) - float(e_d)) < 2e-2
    assert float(jnp.max(jnp.abs(f + g_d))) < 2e-2
    assert np.isfinite(np.asarray(f)).all()


@pytest.mark.slow
def test_pair_kernel_padding_independent(system_and_positions):
    """Results must not depend on the pad amount (tile size)."""
    system, x = system_and_positions
    e1, f1 = build_pair_force_fn(system, tile=128, interpret=True)(x)
    e2, f2 = build_pair_force_fn(system, tile=256, interpret=True)(x)
    assert float(e1) == pytest.approx(float(e2), abs=5e-3)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=5e-3)


@pytest.mark.slow
def test_pair_kernel_translation_parity(system_and_positions):
    """At translated coordinates the kernel still matches the dense path
    exactly (absolute translation invariance itself is limited by f32
    coordinate-difference precision — identically so for both paths, so
    parity is the right gate, not invariance)."""
    system, x = system_and_positions
    fn = build_pair_force_fn(system, tile=128, interpret=True)
    xs = x + jnp.asarray([1.0, -2.0, 0.5])
    e1, f1 = fn(xs)
    e_d, g_d = jax.value_and_grad(lambda p: potential_energy(system, p))(xs)
    assert float(e1) == pytest.approx(float(e_d), abs=2e-2)
    np.testing.assert_allclose(np.asarray(f1), -np.asarray(g_d), atol=2e-2)


def test_radius_classes_cover_atoms(system_and_positions):
    from pmarlo_tpu.md.pallas_pair import _radius_classes

    system, _ = system_and_positions
    rho = np.asarray(system.gb_radii) - system.gb_offset
    vals, onehot = _radius_classes(rho)
    assert onehot.shape == (system.n_atoms, len(vals))
    np.testing.assert_allclose(onehot.sum(axis=1), 1.0)
    # few distinct radii: the class-matmul trick stays cheap
    assert len(vals) <= 8
    np.testing.assert_allclose(onehot @ vals, np.round(rho, 9), atol=1e-6)


@pytest.mark.slow
def test_pair_kernel_without_dense_matrices():
    """The pair kernel must produce identical physics from a System
    built WITHOUT the (N, N) scale/neck matrices (dense_scales=False,
    automatic past 12k atoms) — the index-band exclusions and the
    radius-class neck lookups replace them (round 3)."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system

    system, x = build_system(
        alanine_dipeptide_structure(), gb_model="gbn2"
    )

    sparse_sys, x2 = build_system(
        alanine_dipeptide_structure(), gb_model="gbn2", dense_scales=False
    )
    assert sparse_sys.scale_elec is None and sparse_sys.gb_neck_d0 is None
    fn_dense = build_pair_force_fn(system, tile=128, interpret=True)
    fn_sparse = build_pair_force_fn(sparse_sys, tile=128, interpret=True)
    e0, f0 = fn_dense(jnp.asarray(x, jnp.float32))
    e1, f1 = fn_sparse(jnp.asarray(x2, jnp.float32))
    assert abs(float(e0) - float(e1)) < 1e-3, (float(e0), float(e1))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-3)
