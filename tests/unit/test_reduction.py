"""Dimensionality reduction analytics (reference
markov_state_model/reduction.py:152 via deeptime/sklearn)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.msm.reduction import (
    ReductionModel,
    _streaming_moments,
    _sym_inv_sqrt,
    pca,
    reduce_features,
    tica,
    vamp,
    vamp2_score,
)
from pmarlo_tpu.utils.errors import EstimationError


def _ar1(phi, n, rng, scale=1.0):
    """Stationary AR(1) series with autoregression phi."""
    x = np.empty(n)
    x[0] = rng.normal(0, scale / np.sqrt(1 - phi**2))
    noise = rng.normal(0, scale, n)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + noise[t]
    return x


@pytest.fixture(scope="module")
def slow_fast():
    """2D process: dim0 slow (phi=0.99), dim1 fast (phi=0.1), mixed."""
    rng = np.random.default_rng(0)
    slow = _ar1(0.99, 50_000, rng)
    fast = _ar1(0.10, 50_000, rng)
    X = np.stack([slow, fast], axis=1)
    # mix so neither input coordinate IS the slow mode
    A = np.array([[0.8, 0.6], [-0.6, 0.8]])
    return X @ A.T, A


def test_pca_recovers_principal_axis():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(20_000, 2)) * np.array([5.0, 0.5])
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    model = pca(X @ R.T, n_components=2)
    # first component parallel to the rotated long axis
    v = model.components[:, 0]
    axis = R @ np.array([1.0, 0.0])
    assert abs(abs(v @ axis) / np.linalg.norm(v) - 1.0) < 1e-2
    # eigenvalues sorted descending, ratio ~ (5/0.5)^2
    assert model.eigenvalues[0] > model.eigenvalues[1]
    assert 80 < model.eigenvalues[0] / model.eigenvalues[1] < 125


def test_tica_finds_slow_mode(slow_fast):
    X, A = slow_fast
    lag = 10
    model = tica(X, lag=lag, n_components=2)
    # leading eigenvalue ~ phi_slow^lag = 0.99^10 ~ 0.904
    assert abs(model.eigenvalues[0] - 0.99**lag) < 0.05
    # projection of the first TIC correlates with the true slow coord
    y = model.transform(X)[:, 0]
    slow_true = X @ np.linalg.inv(A).T  # unmix
    r = np.corrcoef(y, slow_true[:, 0])[0, 1]
    assert abs(r) > 0.99


def test_tica_eigenvalues_bounded(slow_fast):
    X, _ = slow_fast
    model = tica(X, lag=5, n_components=2)
    assert np.all(model.eigenvalues <= 1.0 + 1e-6)
    assert model.eigenvalues[0] >= model.eigenvalues[1]


def test_vamp_matches_tica_on_reversible_data(slow_fast):
    X, _ = slow_fast
    lag = 10
    t = tica(X, lag=lag, n_components=1)
    v = vamp(X, lag=lag, n_components=1)
    yt = t.transform(X)[:, 0]
    yv = v.transform(X)[:, 0]
    assert abs(np.corrcoef(yt, yv)[0, 1]) > 0.99
    assert abs(t.eigenvalues[0] - v.eigenvalues[0]) < 0.05


def test_vamp2_score_ordering(slow_fast):
    X, _ = slow_fast
    rng = np.random.default_rng(2)
    noise = rng.normal(size=X.shape)
    s_slow = vamp2_score(X, lag=10)
    s_noise = vamp2_score(noise, lag=10)
    assert s_slow > s_noise
    # white noise: singular values ~ 0 -> score ~ 1 (the constant)
    assert abs(s_noise - 1.0) < 0.05
    # upper bound: 1 + d
    assert s_slow <= 1.0 + X.shape[1] + 1e-6


def test_streaming_moments_match_batch():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(5_000, 3))
    # two shards must accumulate to the same moments as the equivalent
    # per-sequence batch computation
    C00a, C0ta, _, na = _streaming_moments([X[:2500], X[2500:]], lag=7)
    X0 = np.concatenate([X[:2493], X[2500:-7]])
    Xt = np.concatenate([X[7:2500], X[2507:]])
    n = X0.shape[0]
    assert na == n
    m0, mt = X0.mean(0), Xt.mean(0)
    C00b = X0.T @ X0 / n - np.outer(m0, m0)
    C0tb = X0.T @ Xt / n - np.outer(m0, mt)
    np.testing.assert_allclose(C00a, C00b, atol=1e-4)
    np.testing.assert_allclose(C0ta, C0tb, atol=1e-4)


def test_sym_inv_sqrt_identity():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(4, 4))
    C = A @ A.T + 0.1 * np.eye(4)
    W = _sym_inv_sqrt(C, 1e-10)
    np.testing.assert_allclose(W @ C @ W.T, np.eye(4), atol=1e-8)


def test_sym_inv_sqrt_singular_raises():
    with pytest.raises(EstimationError):
        _sym_inv_sqrt(np.zeros((3, 3)), 1e-6)


def test_no_lagged_pairs_raises():
    with pytest.raises(EstimationError):
        tica([np.zeros((5, 2))], lag=10)


def test_reduce_features_nan_imputation(slow_fast):
    X, _ = slow_fast
    Xn = X[:5000].copy()
    Xn[10, 0] = np.nan
    Xn[200, 1] = np.inf
    out, model = reduce_features([Xn], method="tica", lag=5)
    assert np.isfinite(out[0]).all()
    assert isinstance(model, ReductionModel)


def test_reduce_features_multi_sequence_shapes(slow_fast):
    X, _ = slow_fast
    seqs = [X[:1000], X[1000:1500], X[1500:3000]]
    out, model = reduce_features(seqs, method="vamp", lag=5, n_components=2)
    assert [o.shape for o in out] == [(1000, 2), (500, 2), (1500, 2)]
    # callable protocol
    np.testing.assert_allclose(model(seqs[0]), out[0], atol=1e-10)


def test_reduce_features_unknown_method():
    with pytest.raises(ValueError):
        reduce_features([np.zeros((100, 2))], method="umap")


def test_pca_via_reduce_features_standardizes():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(2000, 2)) * np.array([100.0, 0.01])
    out, _ = reduce_features([X], method="pca", standardize=True)
    # standardized columns -> neither dominates: variance of PC1 ~ 1
    assert 0.5 < out[0][:, 0].std() < 2.0
