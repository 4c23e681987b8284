"""Mesh reductions and REMD checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.msm.counting import counts_from_dtrajs
from pmarlo_tpu.parallel import (
    replica_mesh,
    sharded_covariance_moments,
    sharded_histogram,
    sharded_transition_counts,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return replica_mesh(8, axis="shard")


def test_sharded_counts_match_serial(mesh):
    rng = np.random.default_rng(0)
    dtrajs = rng.integers(0, 5, size=(8, 200))
    dtrajs[0, 10] = -1  # invalid frame
    C_ref = counts_from_dtrajs([d for d in dtrajs], 3, 5)
    C = sharded_transition_counts(dtrajs, 3, 5, mesh)
    np.testing.assert_allclose(C, C_ref)


def test_sharded_covariances_match_serial(mesh):
    from pmarlo_tpu.msm.reduction import _streaming_moments

    rng = np.random.default_rng(1)
    X = rng.normal(size=(8, 100, 3)).astype(np.float32)
    C00, C0t, Ctt, mean0, meant, n = sharded_covariance_moments(X, 5, mesh)
    C00r, C0tr, Cttr, nr = _streaming_moments([x for x in X], 5)
    assert n == nr
    np.testing.assert_allclose(C00, C00r, atol=1e-5)
    np.testing.assert_allclose(C0t, C0tr, atol=1e-5)
    np.testing.assert_allclose(Ctt, Cttr, atol=1e-5)


@pytest.mark.slow
def test_sharded_histogram_matches_numpy(mesh):
    rng = np.random.default_rng(2)
    values = rng.normal(size=(8, 500)).astype(np.float32)
    edges = np.linspace(-3, 3, 25)
    H = sharded_histogram(values, edges, mesh)
    H_ref, _ = np.histogram(values.reshape(-1), bins=edges)
    # boundary conventions may differ by at most the edge samples
    assert abs(H.sum() - H_ref.sum()) <= 2
    np.testing.assert_allclose(H[1:-1], H_ref[1:-1], atol=2)


@pytest.mark.slow
def test_remd_checkpoint_roundtrip(tmp_path, alanine_system):
    from pmarlo_tpu.bias.metadynamics import MetadynamicsBias
    from pmarlo_tpu.remd.checkpoint import load_checkpoint, save_checkpoint
    from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

    system, positions, _ = alanine_system
    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=500,
                     exchange_frequency=50, report_interval=50, seed=9)
    remd = ReplicaExchange(system, positions, cfg)
    remd.run(n_steps=200)

    mtd = MetadynamicsBias(sigma=(0.1,), max_hills=16)
    hills = mtd.init_state(1)
    hills = mtd.deposit(hills, jnp.asarray([0.5], jnp.float32))

    path = save_checkpoint(remd, tmp_path / "ck.npz", hills=hills,
                           extra={"round": 1})
    remd2, hills2, extra = load_checkpoint(path, system)
    assert extra == {"round": 1}
    np.testing.assert_array_equal(
        np.asarray(remd.state.positions), np.asarray(remd2.state.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(remd.replica_ids), np.asarray(remd2.replica_ids)
    )
    assert int(hills2.n_hills) == 1

    # deterministic continuation: both continue identically
    r1 = remd.run(n_steps=100)
    r2 = remd2.run(n_steps=100)
    np.testing.assert_allclose(r1.positions, r2.positions, atol=1e-6)
