"""DeepTICA model-surface tests beyond training smoke (reference
ml/deeptica facade + cv_bias_potential force path)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.ml.deeptica import (
    DeepTICAConfig,
    DeepTICAModel,
    init_mlp_params,
    mlp_apply,
    train_deeptica,
)
from pmarlo_tpu.ml.losses import vamp2_loss


@pytest.fixture(scope="module")
def slow_data():
    """Mixed slow/fast AR(1) features (the DeepTICA workload shape)."""
    rng = np.random.default_rng(0)
    n = 4000
    slow = np.empty(n)
    slow[0] = 0.0
    for t in range(1, n):
        slow[t] = 0.98 * slow[t - 1] + rng.normal(0, 0.2)
    X = np.stack([
        slow + rng.normal(0, 0.05, n),
        rng.normal(0, 1.0, n),
        0.5 * slow + rng.normal(0, 0.5, n),
    ], axis=1).astype(np.float32)
    return X


@pytest.fixture(scope="module")
def trained(slow_data, tmp_path_factory):
    cfg = DeepTICAConfig.small_data(lag=5, n_out=1, max_epochs=30, seed=0)
    model = train_deeptica([slow_data], cfg)
    return model, model.training_history, slow_data


@pytest.mark.slow
def test_training_improves_score(trained):
    _, history, _ = trained
    epochs = history["epochs"]
    assert epochs[-1]["val_vamp2"] >= epochs[0]["val_vamp2"]
    # slow mode phi=0.98, lag=5 -> singular value^2 ~ 0.98^10 ~ 0.82
    assert history["vamp2_after"] > 0.5


def test_as_function_jits_and_differentiates(trained):
    model, _, X = trained
    fn = model.as_function()
    x0 = jnp.asarray(X[0])
    y = jax.jit(fn)(x0)
    assert y.shape == (1,)
    # the CV bias path needs d(cv)/d(features) — must be differentiable
    g = jax.grad(lambda x: fn(x)[0])(x0)
    assert g.shape == x0.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0


def test_transform_matches_as_function(trained):
    model, _, X = trained
    fn = model.as_function()
    batch = model.transform(X[:16])
    single = np.stack([np.asarray(fn(jnp.asarray(x))) for x in X[:16]])
    np.testing.assert_allclose(batch, single, atol=1e-5)


def test_cv_correlates_with_slow_mode(trained):
    model, _, X = trained
    y = model.transform(X)[:, 0]
    slow_proxy = X[:, 0].astype(np.float64)
    r = np.corrcoef(y, slow_proxy)[0, 1]
    assert abs(r) > 0.8


def test_save_load_bitwise(trained, tmp_path):
    model, _, X = trained
    prefix = tmp_path / "model"
    model.save(prefix)
    loaded = DeepTICAModel.load(prefix)
    np.testing.assert_allclose(
        model.transform(X[:64]), loaded.transform(X[:64]), atol=0.0
    )


def test_vamp2_loss_batch_invariance():
    rng = np.random.default_rng(1)
    z0 = jnp.asarray(rng.normal(size=(512, 2)).astype(np.float32))
    zt = jnp.asarray(0.9 * np.asarray(z0) + rng.normal(
        0, 0.1, (512, 2)).astype(np.float32))
    l1 = float(vamp2_loss(z0, zt)[0])
    # permuting pairs jointly cannot change the loss
    perm = rng.permutation(512)
    l2 = float(vamp2_loss(z0[perm], zt[perm])[0])
    assert abs(l1 - l2) < 1e-4


def test_mlp_apply_shapes():
    key = jax.random.PRNGKey(0)
    params = init_mlp_params(key, 4, (8,), 2)
    x = jnp.zeros((7, 4))
    y = mlp_apply(params, x)
    assert y.shape == (7, 2)


def test_config_schedule_and_validation():
    cfg = DeepTICAConfig.small_data(lag=3)
    assert all(isinstance(s, int) for s in cfg.schedule())
    with pytest.raises(Exception):
        DeepTICAConfig(lag=0)


def test_vamp2_gradient_finite_when_cholesky_rung_fails():
    """Indefinite C00 makes the jitter ladder's first rung produce NaNs;
    the gradient must stay finite (double-where sanitization), or
    ill-conditioned training silently diverges to NaN weights."""
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.ml.losses import vamp2_loss_from_covariances

    # indefinite symmetric matrix: cholesky(C + 0*jitter) fails
    C00 = jnp.asarray([[1.0, 0.0], [0.0, -0.5]], jnp.float32)
    Ctt = jnp.eye(2, dtype=jnp.float32)
    C0t = 0.3 * jnp.eye(2, dtype=jnp.float32)

    def loss_of(c00):
        loss, _ = vamp2_loss_from_covariances(c00, C0t, Ctt, ridge=0.0)
        return loss

    val = loss_of(C00)
    g = jax.grad(loss_of)(C00)
    assert bool(jnp.isfinite(val)), val
    assert bool(jnp.isfinite(g).all()), g


def test_whitening_refuses_impossible_unit_covariance():
    import numpy as np
    import pytest

    from pmarlo_tpu.ml.whitening import WhiteningError, apply_output_transform

    meta = {"mean": np.zeros(2), "transform": np.eye(2),
            "output_transform_applied": True}
    with pytest.raises(WhiteningError, match="more samples"):
        apply_output_transform(np.ones((2, 2)), meta,
                               enforce_unit_covariance=True)
    with pytest.raises(WhiteningError, match="2D"):
        apply_output_transform(np.ones(4), meta)
