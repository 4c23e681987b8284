"""Data-parallel DeepTICA step: exact parity with the serial math on an
8-device CPU mesh (SURVEY section 2c scaling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pmarlo_tpu.ml.deeptica import DeepTICAConfig, init_mlp_params, mlp_apply
from pmarlo_tpu.ml.losses import vamp2_loss
from pmarlo_tpu.parallel.mesh import data_mesh
from pmarlo_tpu.parallel.train import (
    make_data_parallel_step,
    train_deeptica_data_parallel,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest sets it)")
    return data_mesh(8)


@pytest.fixture(scope="module")
def pairs():
    rng = np.random.default_rng(0)
    n = 1024
    slow = np.cumsum(rng.normal(0, 0.1, n + 5)).astype(np.float32)
    X = np.stack([
        slow[:n], rng.normal(0, 1, n).astype(np.float32),
        0.5 * slow[:n],
    ], 1)
    Xt = np.stack([
        slow[5:], rng.normal(0, 1, n).astype(np.float32),
        0.5 * slow[5:],
    ], 1)
    return X, Xt


def _serial_step(params, opt_state, tx, cfg, z0, zt):
    def loss_fn(p):
        y0 = mlp_apply(p, z0, cfg.activation, cfg.layernorm)
        yt = mlp_apply(p, zt, cfg.activation, cfg.layernorm)
        return vamp2_loss(y0, yt, ridge=cfg.vamp_ridge, alpha=cfg.vamp_alpha)

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@pytest.mark.slow
def test_dp_step_matches_serial(mesh, pairs):
    # SGD(lr=1) makes params_new = params - grad: parameter parity IS
    # gradient parity (adam would amplify 1e-8 gradient noise on the
    # mean-invariant bias leaves into O(lr) param differences)
    z0, zt = pairs
    cfg = DeepTICAConfig(lag=5, n_out=2, hidden=(16,), seed=0)
    key = jax.random.PRNGKey(0)
    params = init_mlp_params(key, 3, cfg.hidden, cfg.n_out)
    tx = optax.sgd(1.0)
    opt_state = tx.init(params)

    dp_step = make_data_parallel_step(cfg, tx, mesh)
    p_dp, _, loss_dp = dp_step(
        params, opt_state, jnp.asarray(z0), jnp.asarray(zt)
    )
    p_sr, _, loss_sr = _serial_step(
        params, opt_state, tx, cfg, jnp.asarray(z0), jnp.asarray(zt)
    )
    assert abs(float(loss_dp) - float(loss_sr)) < 1e-4
    for ld, ls in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_sr)):
        np.testing.assert_allclose(
            np.asarray(ld), np.asarray(ls), atol=5e-6, rtol=1e-5
        )


@pytest.mark.slow
def test_dp_training_reduces_loss(mesh, pairs):
    z0, zt = pairs
    cfg = DeepTICAConfig(lag=5, n_out=1, hidden=(16,), seed=1,
                         learning_rate=3e-3)
    params, losses = train_deeptica_data_parallel(
        z0, zt, cfg, mesh, n_epochs=25
    )
    assert losses[-1] < losses[0]
    # VAMP-2 loss is -score: should go below the trivial 0
    assert losses[-1] < -0.2
