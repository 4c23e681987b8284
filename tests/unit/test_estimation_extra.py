"""Estimation/ITS/PCCA analytics beyond the core MSM tests
(reference markov_state_model/_estimation.py, _its.py, deeptime PCCA+)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.msm.clustering import (
    assign_to_centers,
    kmeans,
    silhouette_score,
)
from pmarlo_tpu.msm.estimation import (
    MSMResult,
    build_msm,
    estimate_transition_matrix,
    reversible_mle,
)
from pmarlo_tpu.msm.its import sample_posterior_timescales
from pmarlo_tpu.msm.pcca import pcca_assignments, pcca_memberships


def _metropolis_chain(T, n, rng):
    """Sample a discrete trajectory from transition matrix T."""
    states = np.empty(n, dtype=np.int64)
    states[0] = 0
    cum = np.cumsum(T, axis=1)
    u = rng.uniform(size=n)
    for t in range(1, n):
        states[t] = np.searchsorted(cum[states[t - 1]], u[t])
    return states


@pytest.fixture(scope="module")
def three_state_T():
    """Reversible 3-state chain with a known spectrum."""
    T = np.array([
        [0.90, 0.08, 0.02],
        [0.16, 0.80, 0.04],
        [0.08, 0.08, 0.84],
    ])
    return T


def test_build_msm_recovers_transition_matrix(three_state_T):
    rng = np.random.default_rng(0)
    dtraj = _metropolis_chain(three_state_T, 200_000, rng)
    msm = build_msm([dtraj], lag=1)
    np.testing.assert_allclose(
        msm.restricted_T(), three_state_T, atol=0.02
    )
    # stationary distribution consistent with T
    pi = msm.stationary_distribution[msm.active_states]
    np.testing.assert_allclose(pi @ msm.restricted_T(), pi, atol=1e-8)


def test_timescales_dt_scaling(three_state_T):
    rng = np.random.default_rng(1)
    dtraj = _metropolis_chain(three_state_T, 100_000, rng)
    msm = build_msm([dtraj], lag=2)
    t1 = msm.timescales(n=2, dt=1.0)
    t2 = msm.timescales(n=2, dt=0.5)
    np.testing.assert_allclose(t1 * 0.5, t2)
    # against the exact eigenvalue of the 2-step matrix
    evals = np.sort(np.abs(np.linalg.eigvals(
        np.linalg.matrix_power(three_state_T, 2))))[::-1]
    exact = -2 / np.log(evals[1])
    assert abs(t1[0] - exact) / exact < 0.15


def test_reversible_mle_recovers_known_T():
    # exact expected counts of a reversible chain -> MLE must return it
    T = np.array([[0.9, 0.1], [0.2, 0.8]])
    pi = np.array([2 / 3, 1 / 3])
    C = (pi[:, None] * T) * 1e6
    T_est = reversible_mle(C)
    np.testing.assert_allclose(T_est, T, atol=1e-6)


def test_nonreversible_estimate_is_row_normalized():
    C = np.array([[5.0, 3.0], [1.0, 7.0]])
    T, pi = estimate_transition_matrix(C, reversible=False)
    np.testing.assert_allclose(T, C / C.sum(1, keepdims=True))
    np.testing.assert_allclose(pi @ T, pi, atol=1e-10)


def test_msmresult_to_dict(three_state_T):
    rng = np.random.default_rng(2)
    msm = build_msm([_metropolis_chain(three_state_T, 20_000, rng)], lag=1)
    d = msm.to_dict()
    assert d["lag"] == 1 and d["n_active"] == 3 and d["reversible"]
    assert isinstance(msm, MSMResult)


def test_posterior_timescales_concentrate_with_counts(three_state_T):
    pi = np.array([0.5, 0.3, 0.2])  # order-of-magnitude weights
    C_small = (pi[:, None] * three_state_T) * 500
    C_big = C_small * 100
    s_small = sample_posterior_timescales(C_small, lag=1, n_samples=60,
                                          n_timescales=1, seed=0)
    s_big = sample_posterior_timescales(C_big, lag=1, n_samples=60,
                                        n_timescales=1, seed=0)
    assert np.nanstd(s_big[:, 0]) < np.nanstd(s_small[:, 0])
    # both center near the exact slowest timescale
    evals = np.sort(np.abs(np.linalg.eigvals(three_state_T)))[::-1]
    exact = -1 / np.log(evals[1])
    assert abs(np.nanmean(s_big[:, 0]) - exact) / exact < 0.2


def test_pcca_memberships_partition_of_unity():
    # two strong blocks + weak link
    T = np.array([
        [0.89, 0.10, 0.01, 0.00],
        [0.10, 0.89, 0.01, 0.00],
        [0.00, 0.01, 0.89, 0.10],
        [0.00, 0.01, 0.10, 0.89],
    ])
    T = T / T.sum(1, keepdims=True)
    M = pcca_memberships(T, 2)
    assert M.shape == (4, 2)
    np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=1e-8)
    assert (M >= -1e-10).all()
    labels, chi = pcca_assignments(T, 2)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]
    assert chi.shape == (4, 2)


def test_kmeans_deterministic_and_assign_consistent():
    rng = np.random.default_rng(3)
    X = np.concatenate([
        rng.normal(-3, 0.2, (500, 2)), rng.normal(3, 0.2, (500, 2)),
    ]).astype(np.float32)
    c1, l1, _ = kmeans(X, 2, seed=42)
    c2, l2, _ = kmeans(X, 2, seed=42)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # assign_to_centers reproduces the training labels
    l3 = assign_to_centers(X, np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(l1), l3)


def test_silhouette_separated_vs_mixed():
    rng = np.random.default_rng(4)
    X_sep = np.concatenate([
        rng.normal(-5, 0.2, (300, 2)), rng.normal(5, 0.2, (300, 2)),
    ]).astype(np.float32)
    labels = np.array([0] * 300 + [1] * 300)
    s_sep = silhouette_score(X_sep, labels, 2)
    X_mix = rng.normal(0, 1.0, (600, 2)).astype(np.float32)
    s_mix = silhouette_score(X_mix, labels, 2)
    assert s_sep > 0.9
    assert s_mix < 0.2
