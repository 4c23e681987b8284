"""Reversible Bayesian posterior (Gibbs over symmetric flow matrices).

Reference semantics: deeptime BayesianMSM samples *reversible* transition
matrices (/root/reference/src/pmarlo/markov_state_model/_its.py:289-312);
the Dirichlet-row sampler in msm/its.py is a different posterior. These
tests pin (a) exactness on a two-state system with known answers, where the
reversible family coincides with the unconstrained one so both posteriors
must agree, and (b) the constraint actually binding at n >= 3 (detailed
balance holds per sample; CIs differ from the row posterior).
"""

import numpy as np
import pytest

from pmarlo_tpu.msm.its import (
    compute_implied_timescales,
    sample_posterior_timescales,
)
from pmarlo_tpu.msm.reversible_sampler import (
    _round_robin_schedule,
    sample_reversible_posterior,
    sample_reversible_timescales,
)


def _two_state_counts(p=0.1, q=0.2, n=20_000, seed=0):
    """Counts from a known 2-state chain; analytic t2 = -1/ln(1-p-q)."""
    rng = np.random.default_rng(seed)
    T = np.array([[1 - p, p], [q, 1 - q]])
    d = np.zeros(n, dtype=np.int64)
    for t in range(1, n):
        d[t] = rng.choice(2, p=T[d[t - 1]])
    C = np.zeros((2, 2))
    np.add.at(C, (d[:-1], d[1:]), 1.0)
    return C, -1.0 / np.log(1.0 - p - q)


def test_schedule_covers_every_edge_once():
    for n in (2, 3, 4, 5, 8, 9):
        pairs, m = _round_robin_schedule(n)
        seen = set()
        for rnd in pairs:
            verts = set()
            for i, j in rnd:
                assert i != j
                # vertex-disjoint within a round (the Gibbs-parallelism
                # requirement)
                assert i not in verts and j not in verts
                verts.update((int(i), int(j)))
                seen.add((int(i), int(j)))
        assert len(seen) == m * (m - 1) // 2


def test_two_state_known_answer():
    C, t_true = _two_state_counts()
    ts = sample_reversible_timescales(C, lag=1, n_samples=64, seed=1)
    med = np.median(ts[:, 0])
    # 20k transitions: the posterior concentrates tightly around truth
    assert abs(med - t_true) / t_true < 0.10


def test_two_state_ci_matches_dirichlet_row_posterior():
    # For n=2 every stochastic matrix is reversible, so the reversible
    # posterior and the independent Dirichlet-row posterior share the same
    # likelihood — medians and CI widths must agree (priors differ only at
    # O(1/counts)).
    C, _ = _two_state_counts()
    rev = sample_reversible_timescales(C, lag=1, n_samples=200, seed=2)[:, 0]
    row = sample_posterior_timescales(C, lag=1, n_samples=200, seed=2)[:, 0]
    w_rev = np.quantile(rev, 0.975) - np.quantile(rev, 0.025)
    w_row = np.quantile(row, 0.975) - np.quantile(row, 0.025)
    assert abs(np.median(rev) - np.median(row)) / np.median(row) < 0.05
    assert 0.6 < w_rev / w_row < 1.6


def test_samples_satisfy_detailed_balance():
    rng = np.random.default_rng(3)
    C = rng.integers(1, 60, (5, 5)).astype(float)
    Ts = sample_reversible_posterior(C, n_samples=16, seed=3)
    assert Ts.shape == (16, 5, 5)
    for T in Ts:
        assert np.allclose(T.sum(axis=1), 1.0, atol=1e-10)
        evals = np.linalg.eigvals(T.T)
        pi = np.real(np.linalg.eig(T.T)[1][:, np.argmax(np.real(evals))])
        pi = np.abs(pi) / np.abs(pi).sum()
        flux = pi[:, None] * T
        assert np.allclose(flux, flux.T, atol=1e-8)


def test_reversible_spectrum_is_real():
    rng = np.random.default_rng(4)
    C = rng.integers(0, 30, (7, 7)).astype(float) + np.eye(7)
    ts = sample_reversible_timescales(C, lag=1, n_samples=32, seed=4)
    assert np.isfinite(ts[:, 0]).all()


def test_constraint_binds_at_three_states():
    # Strongly non-reversible counts (directed cycle): the reversible
    # posterior must disagree with the row posterior on the slowest
    # timescale (the row posterior sees an oscillatory complex pair, the
    # reversible one cannot).
    C = np.array([[50.0, 40.0, 2.0],
                  [2.0, 50.0, 40.0],
                  [40.0, 2.0, 50.0]])
    rev = sample_reversible_timescales(C, lag=1, n_samples=100, seed=5)[:, 0]
    row = sample_posterior_timescales(C, lag=1, n_samples=100, seed=5)[:, 0]
    assert np.isfinite(rev).all()
    assert abs(np.median(rev) - np.median(row)) > 0.05 * np.median(row)


def test_its_reversible_flag_end_to_end():
    rng = np.random.default_rng(6)
    # two-state chain as a dtraj
    T = np.array([[0.9, 0.1], [0.2, 0.8]])
    d = np.zeros(4000, dtype=np.int64)
    for t in range(1, 4000):
        d[t] = rng.choice(2, p=T[d[t - 1]])
    its = compute_implied_timescales(
        [d], lags=[1, 2, 5], n_samples=24, reversible=True, seed=6
    )
    t_true = -1.0 / np.log(0.7)
    assert its.timescales.shape[0] == 3
    assert abs(its.timescales[0, 0] - t_true) / t_true < 0.25
    # CIs bracket the median
    assert (its.ci_lower[:, 0] <= its.timescales[:, 0] + 1e-9).all()
    assert (its.ci_upper[:, 0] >= its.timescales[:, 0] - 1e-9).all()


def test_zero_edges_stay_zero():
    # states 0-1 and 2-3 connect only through 1-2; absent edges (0,2),
    # (0,3), (1,3) must stay exactly zero in every sample (deeptime's
    # sparsity structure)
    C = np.array([[10.0, 5.0, 0.0, 0.0],
                  [5.0, 10.0, 3.0, 0.0],
                  [0.0, 3.0, 10.0, 5.0],
                  [0.0, 0.0, 5.0, 10.0]])
    Ts = sample_reversible_posterior(C, n_samples=8, seed=7)
    assert (Ts[:, 0, 2] == 0).all() and (Ts[:, 0, 3] == 0).all()
    assert (Ts[:, 1, 3] == 0).all() and (Ts[:, 3, 0] == 0).all()
