"""Transition-path-theory invariants (reference
markov_state_model/_tpt.py, conformations/tpt_analysis.py)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.msm.tpt import committors, mfpt_matrix, reactive_flux
from pmarlo_tpu.utils.errors import EstimationError
from pmarlo_tpu.utils.msm_utils import stationary_distribution


def _birth_death(p, q, n):
    """Birth-death chain: up-prob p, down-prob q, else stay."""
    T = np.zeros((n, n))
    for i in range(n):
        if i + 1 < n:
            T[i, i + 1] = p
        if i - 1 >= 0:
            T[i, i - 1] = q
        T[i, i] = 1.0 - T[i].sum()
    return T


@pytest.fixture(scope="module")
def chain5():
    return _birth_death(0.3, 0.2, 5)


def test_committor_boundary_and_monotone(chain5):
    qp, qm = committors(chain5, [0], [4])
    assert qp[0] == 0.0 and qp[4] == 1.0
    assert qm[0] == 1.0 and qm[4] == 0.0
    # 1D chain: forward committor monotone along the chain
    assert np.all(np.diff(qp) > 0)


def test_committor_analytic_symmetric_walk():
    # unbiased random walk: q+(i) = i / (n-1) exactly
    T = _birth_death(0.25, 0.25, 6)
    qp, _ = committors(T, [0], [5])
    np.testing.assert_allclose(qp, np.arange(6) / 5.0, atol=1e-10)


def test_committor_reversible_relation(chain5):
    # reversible chain: q- = 1 - q+
    qp, qm = committors(chain5, [0], [4])
    np.testing.assert_allclose(qm, 1.0 - qp, atol=1e-10)


def test_flux_conservation_across_cuts(chain5):
    r = reactive_flux(chain5, [0], [4])
    # in a linear chain the net flux through every edge (i, i+1) equals
    # the total flux (a cut argument)
    for i in range(4):
        assert abs(r.net_flux[i, i + 1] - r.total_flux) < 1e-12


def test_flux_into_sink_equals_out_of_source(chain5):
    r = reactive_flux(chain5, [0], [4])
    out_A = r.net_flux[0, :].sum()
    into_B = r.net_flux[:, 4].sum()
    assert abs(out_A - into_B) < 1e-12
    assert abs(out_A - r.total_flux) < 1e-12


def test_rate_mfpt_reciprocal(chain5):
    r = reactive_flux(chain5, [0], [4])
    assert abs(r.rate * r.mfpt - 1.0) < 1e-12
    assert r.rate > 0


def test_pathway_decomposition_sums_to_total(chain5):
    r = reactive_flux(chain5, [0], [4], pathway_fraction=0.9999)
    path_flux = sum(f for _, f in r.pathways)
    assert abs(path_flux - r.total_flux) / r.total_flux < 1e-6
    # single channel: exactly one pathway 0-1-2-3-4
    assert r.pathways[0][0] == [0, 1, 2, 3, 4]


def test_two_channel_pathways():
    # diamond: 0 -> {1, 2} -> 3, channel via 1 is wider
    T = np.array([
        [0.2, 0.5, 0.2, 0.1],
        [0.3, 0.4, 0.0, 0.3],
        [0.3, 0.0, 0.4, 0.3],
        [0.1, 0.3, 0.3, 0.3],
    ])
    T = T / T.sum(1, keepdims=True)
    r = reactive_flux(T, [0], [3], pathway_fraction=0.999)
    paths = {tuple(p) for p, _ in r.pathways}
    assert (0, 1, 3) in paths and (0, 2, 3) in paths
    flux = {tuple(p): f for p, f in r.pathways}
    assert flux[(0, 1, 3)] > flux[(0, 2, 3)]


def test_mfpt_matrix_birth_death_analytic():
    # two-state: mfpt(0 -> 1) = 1/p01
    T = np.array([[0.9, 0.1], [0.4, 0.6]])
    M = mfpt_matrix(T)
    assert abs(M[0, 1] - 10.0) < 1e-9
    assert abs(M[1, 0] - 2.5) < 1e-9
    assert M[0, 0] == 0.0 and M[1, 1] == 0.0


def test_mfpt_matrix_dt_scaling(chain5):
    M1 = mfpt_matrix(chain5, dt=1.0)
    M2 = mfpt_matrix(chain5, dt=2.0)
    np.testing.assert_allclose(M2, 2.0 * M1)


def test_overlapping_source_sink_raises(chain5):
    with pytest.raises(EstimationError):
        committors(chain5, [0, 2], [2, 4])


def test_tpt_result_to_dict(chain5):
    d = reactive_flux(chain5, [0], [4]).to_dict()
    assert d["source_states"] == [0] and d["sink_states"] == [4]
    assert d["n_pathways"] == len(d["pathways"]) >= 1
    assert np.isfinite(d["rate"])


def test_rate_against_long_simulation():
    # empirical MFPT from direct simulation matches TPT mfpt
    T = _birth_death(0.35, 0.3, 4)
    r = reactive_flux(T, [0], [3])
    rng = np.random.default_rng(0)
    cum = np.cumsum(T, axis=1)
    times = []
    for _ in range(300):
        s, t = 0, 0
        while s != 3 and t < 10000:
            s = int(np.searchsorted(cum[s], rng.uniform()))
            t += 1
        times.append(t)
    # A->B mean first-passage time (plain MFPT, not the TPT cycle time):
    mfpt_ab = mfpt_matrix(T)[0, 3]
    emp = np.mean(times)
    assert abs(emp - mfpt_ab) / mfpt_ab < 0.15


def test_stationary_distribution_validates():
    T = _birth_death(0.3, 0.2, 5)
    pi = stationary_distribution(T)
    np.testing.assert_allclose(pi @ T, pi, atol=1e-10)
    np.testing.assert_allclose(pi.sum(), 1.0)
    # birth-death detailed balance: pi_i p = pi_{i+1} q
    for i in range(4):
        assert abs(pi[i] * 0.3 - pi[i + 1] * 0.2) < 1e-10
