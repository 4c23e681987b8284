"""DeepTICA: loss math, whitening, training smoke, persistence."""

import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.ml.deeptica import DeepTICAConfig, DeepTICAModel, train_deeptica
from pmarlo_tpu.ml.losses import vamp2_loss
from pmarlo_tpu.ml.whitening import (
    apply_output_transform,
    estimate_whitening,
    _coerce_bool_flag,
)
from pmarlo_tpu.utils.errors import WhiteningError


def test_vamp2_loss_identity_process():
    # z_t = z_{t+tau}: perfectly autocorrelated 2D process -> score ~ 2
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2000, 2)).astype(np.float32)
    loss, metrics = vamp2_loss(jnp.asarray(z), jnp.asarray(z))
    assert 1.7 < float(metrics["vamp2"]) <= 2.05


def test_vamp2_loss_uncorrelated():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4000, 2)).astype(np.float32)
    b = rng.normal(size=(4000, 2)).astype(np.float32)
    _, metrics = vamp2_loss(jnp.asarray(a), jnp.asarray(b))
    assert float(metrics["vamp2"]) < 0.1


def test_config_validation():
    with pytest.raises(ValueError):
        DeepTICAConfig(lag=0)
    with pytest.raises(ValueError):
        DeepTICAConfig(activation="swishx")
    cfg = DeepTICAConfig.small_data()
    assert cfg.hidden == (32, 32)


def test_whitening_roundtrip():
    rng = np.random.default_rng(2)
    Y = rng.normal(size=(500, 3)) @ np.diag([3.0, 1.0, 0.2]) + 5.0
    meta = estimate_whitening(Y, shrinkage=0.0)
    out = apply_output_transform(Y, meta)
    cov = np.cov(out.T)
    np.testing.assert_allclose(cov, np.eye(3), atol=0.1)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-8)


def test_whitening_strict_flags():
    assert _coerce_bool_flag(True) is True
    assert _coerce_bool_flag("false") is False
    assert _coerce_bool_flag(1) is True
    with pytest.raises(WhiteningError):
        _coerce_bool_flag("maybe")
    with pytest.raises(WhiteningError):
        _coerce_bool_flag(2.5)
    with pytest.raises(WhiteningError):
        apply_output_transform(np.zeros((5, 2)), {"mean": np.zeros(2)})


@pytest.mark.slow
def test_train_smoke_and_persistence(tmp_path):
    rng = np.random.default_rng(3)
    # hidden slow mode in 3 observed dims
    slow = np.cumsum(rng.normal(size=3000)) * 0.01
    slow = np.tanh(slow)
    X = np.stack([slow + 0.1 * rng.normal(size=3000) for _ in range(3)], axis=1)
    cfg = DeepTICAConfig(
        lag=5, n_out=1, hidden=(8,), max_epochs=8, batch_size=256,
        early_stopping_patience=8, seed=1,
    )
    model = train_deeptica(X.astype(np.float32), cfg, progress_dir=tmp_path)
    assert (tmp_path / "training_progress.json").exists()
    h = model.training_history
    assert h["best"]["val_vamp2"] > 0
    Y = model.transform(X)
    assert Y.shape == (3000, 1)
    # smoke threshold: the CV must clearly track the hidden slow mode
    # (the dedicated recovery check with a full budget reaches ~0.98)
    assert abs(np.corrcoef(Y[:, 0], slow)[0, 1]) > 0.6

    model.save(tmp_path / "m")
    loaded = DeepTICAModel.load(tmp_path / "m")
    np.testing.assert_allclose(loaded.transform(X), Y, atol=1e-6)


def test_train_rejects_too_short():
    X = np.random.rand(8, 3).astype(np.float32)
    with pytest.raises(ValueError, match="too few training pairs"):
        train_deeptica(X, DeepTICAConfig(lag=5, max_epochs=1))
