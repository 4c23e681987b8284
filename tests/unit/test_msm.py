"""MSM math: counting, estimation, ITS, CK — the reference's analytic
two-state oracles (tests/unit/markov_state_model/ in the reference)."""

import numpy as np
import pytest

from pmarlo_tpu.msm.counting import counts_from_dtrajs, split_invalid_segments
from pmarlo_tpu.msm.estimation import build_msm, reversible_mle
from pmarlo_tpu.msm.its import compute_implied_timescales, detect_plateau
from pmarlo_tpu.msm.ck import ck_test, decide_ck, CKConfig
from pmarlo_tpu.utils.errors import EstimationError
from pmarlo_tpu.utils.msm_utils import (
    candidate_lag_ladder,
    check_transition_matrix,
    ensure_connected_counts,
    stationary_distribution,
)


def _two_state_dtraj(p_stay=0.95, n=50_000, seed=0):
    rng = np.random.default_rng(seed)
    d = np.zeros(n, dtype=np.int64)
    for t in range(1, n):
        d[t] = d[t - 1] if rng.random() < p_stay else 1 - d[t - 1]
    return d


def test_counting_hand_check():
    d = np.array([0, 0, 1, 1, 0, -1, 1, 1])
    C = counts_from_dtrajs([d], 1, 2)
    # pairs: (0,0)(0,1)(1,1)(1,0); (0,-1) and (-1,1) dropped; (1,1)
    assert C[0, 0] == 1 and C[0, 1] == 1 and C[1, 1] == 2 and C[1, 0] == 1


def test_counting_segment_safety():
    # two segments must not create a cross-boundary pair
    C_joint = counts_from_dtrajs([np.array([0, 0]), np.array([1, 1])], 1, 2)
    assert C_joint[0, 1] == 0
    C_concat = counts_from_dtrajs([np.array([0, 0, 1, 1])], 1, 2)
    assert C_concat[0, 1] == 1


def test_strided_counting():
    d = np.arange(10) % 2
    sliding = counts_from_dtrajs([d], 2, 2)
    strided = counts_from_dtrajs([d], 2, 2, count_mode="strided")
    assert sliding.sum() == 8 and strided.sum() == 4


def test_two_state_msm_analytic():
    d = _two_state_dtraj()
    msm = build_msm(d, lag=1, n_states=2)
    # symmetric chain: pi = [0.5, 0.5], T offdiag ~ 0.05
    np.testing.assert_allclose(msm.stationary_distribution, [0.5, 0.5], atol=0.02)
    np.testing.assert_allclose(msm.transition_matrix[0, 1], 0.05, atol=0.01)
    # t1 = -1/ln(2*p_stay - 1) = -1/ln(0.9)
    expected_t1 = -1 / np.log(0.9)
    assert abs(msm.timescales(1)[0] - expected_t1) / expected_t1 < 0.15


def test_reversible_mle_detailed_balance():
    rng = np.random.default_rng(1)
    C = rng.integers(1, 50, (5, 5)).astype(float)
    T = reversible_mle(C)
    check_transition_matrix(T)
    pi = stationary_distribution(T)
    flux = pi[:, None] * T
    np.testing.assert_allclose(flux, flux.T, atol=1e-6)


def test_connected_counts_restriction():
    C = np.array([[5, 1, 0], [2, 3, 0], [0, 0, 7.0]])  # state 2 disconnected
    restricted, active = ensure_connected_counts(C)
    assert set(active.tolist()) == {0, 1}
    assert restricted.shape == (2, 2)


def test_lag_exceeding_length_raises():
    with pytest.raises(EstimationError, match="lag"):
        build_msm(np.zeros(5, dtype=int), lag=10, n_states=2)


@pytest.mark.slow
def test_its_recovers_timescale(double_well_dtrajs):
    dtrajs, _ = double_well_dtrajs
    its = compute_implied_timescales(
        dtrajs, lags=[1, 2, 5, 10, 20], n_samples=25, n_timescales=2
    )
    assert its.timescales.shape == (5, 2)
    assert np.isfinite(its.timescales[:, 0]).all()
    assert (its.ci_upper[:, 0] >= its.ci_lower[:, 0]).all()
    # slowest timescale roughly lag-independent at larger lags
    assert its.timescales[-1, 0] > 10


def test_plateau_detection():
    lags = np.array([1, 2, 5, 10, 20])
    its = np.array([[50.0], [80.0], [100.0], [101.0], [99.0]])
    assert detect_plateau(lags, its) == 5


def test_ck_two_state_passes(double_well_dtrajs):
    dtrajs, _ = double_well_dtrajs
    ck = ck_test(dtrajs, lag=5, factors=(2, 3))
    assert not ck.insufficient_data
    assert ck.max_error < 0.1
    decision = decide_ck(ck, CKConfig(threshold=0.1))
    assert decision["passed"]


def test_split_invalid_segments():
    d = np.array([0, 1, -1, 2, 3, -1, -1, 4])
    segs = split_invalid_segments(d)
    assert [s.tolist() for s in segs] == [[0, 1], [2, 3], [4]]


def test_lag_ladder_monotone():
    ladder = candidate_lag_ladder(100, n_lags=10)
    assert ladder == sorted(set(ladder))
    assert ladder[0] >= 1 and ladder[-1] <= 100


def test_lag_selector(double_well_dtrajs):
    from pmarlo_tpu.msm.ck_its_selector import select_optimal_lag_ck_its

    dtrajs, _ = double_well_dtrajs
    sel = select_optimal_lag_ck_its(
        dtrajs, candidate_lags=[1, 2, 5, 10], ck_factors=(2, 3)
    )
    assert sel.selected_lag in (1, 2, 5, 10)
    assert any(e.feasible for e in sel.evaluations)
    assert "lag" in sel.reason
    d = sel.to_dict()
    assert len(d["evaluations"]) == 4


@pytest.mark.slow
def test_msm_builder(double_well_dtrajs):
    from pmarlo_tpu.msm.msm_builder import MSMBuilder

    _, xs = double_well_dtrajs
    X = [x[:, None].astype("float32") for x in xs]
    builder = MSMBuilder(n_states=8, lag=5).fit(X)
    assert builder.msm is not None
    labels = builder.transform(X[0][:100])
    assert labels.shape == (100,)
    assert (labels >= 0).all() and (labels < 8).all()


@pytest.mark.slow
def test_silhouette_and_auto_k():
    from pmarlo_tpu.msm.clustering import cluster_microstates, silhouette_score

    rng = np.random.default_rng(0)
    X = np.concatenate([
        rng.normal(-5, 0.3, (200, 2)), rng.normal(5, 0.3, (200, 2))
    ]).astype(np.float32)
    labels = np.array([0] * 200 + [1] * 200)
    assert silhouette_score(X, labels, 2) > 0.9
    assert abs(silhouette_score(X, rng.integers(0, 2, 400), 2)) < 0.1
    res = cluster_microstates(X, "auto", seed=0, auto_range=range(2, 6))
    assert res.n_states == 2
    assert res.silhouette > 0.9


@pytest.mark.slow
def test_enhanced_auto_lag(double_well_dtrajs):
    from pmarlo_tpu.msm.enhanced import EnhancedMSM

    _, xs = double_well_dtrajs
    feats = [np.stack([x, np.roll(x, 1)], axis=1).astype("float32") for x in xs]
    msm = EnhancedMSM()
    msm.load_trajectories(feats)
    msm.compute_features()  # passthrough for feature matrices
    msm.cluster_features(8, seed=0)
    msm.build_msm("auto")
    assert msm.msm is not None
    assert msm.msm.lag >= 1
    with pytest.raises(ValueError, match="auto"):
        msm.build_msm("best")


@pytest.mark.slow
def test_state_table_bootstrap_errors(double_well_dtrajs):
    from pmarlo_tpu.msm.enhanced import EnhancedMSM

    dtrajs, xs = double_well_dtrajs
    m = EnhancedMSM()
    m.features = [x[:, None].astype(np.float32) for x in xs]
    m.cluster_features(n_states=6, seed=0)
    m.build_msm(lag_time=5)
    table = m.create_state_table(free_energy_errors=True)
    errs = [r["free_energy_err"] for r in table if r.get("free_energy_err")]
    assert errs and all(e > 0 for e in errs)
    # heavier-sampled states have smaller dG error
    counts = {r["state"]: r["count"] for r in table}
    by_err = sorted(
        (r["free_energy_err"], r["count"]) for r in table
        if r.get("free_energy_err")
    )
    assert by_err[0][1] >= by_err[-1][1]


@pytest.mark.slow
def test_enhanced_plot_method_surface(double_well_dtrajs, tmp_path):
    """The reference Protocol's plot methods (enhanced_msm.py:74-85):
    plot_implied_rates / plot_free_energy_profile / plot_ck_test exist
    on the class and write files."""
    import matplotlib

    matplotlib.use("Agg")
    from pmarlo_tpu.msm.enhanced import EnhancedMSM

    _, xs = double_well_dtrajs
    m = EnhancedMSM(output_dir=tmp_path)
    m.features = [x[:, None].astype(np.float32) for x in xs]
    m.cluster_features(n_states=6, seed=0)
    m.build_msm(lag_time=5)
    m.compute_implied_timescales(lags=[1, 2, 5, 10], n_samples=8)
    m.compute_ck_test(factors=[2, 3])
    m.plot_implied_rates(tmp_path / "rates.png")
    m.plot_free_energy_profile(0, tmp_path / "pmf.png")
    m.plot_ck_test(tmp_path / "ck.png")
    for name in ("rates.png", "pmf.png", "ck.png"):
        assert (tmp_path / name).exists()
        assert (tmp_path / name).stat().st_size > 0


def test_tica_refreshes_feature_info():
    """After in-place TICA the feature space IS the TICA space: stale
    torsion names/periodic flags would wrap unbounded TIC values."""
    from pmarlo_tpu.msm.enhanced import EnhancedMSM

    rng = np.random.default_rng(0)
    t = np.linspace(0, 20, 600)
    X = np.stack([np.sin(t), np.cos(t), rng.normal(0, 0.1, 600),
                  rng.normal(0, 0.1, 600)], axis=1)
    msm = EnhancedMSM()
    msm.load_trajectories([X.astype(np.float32)])
    msm.compute_features(use_tica=True, tica_lag=5, tica_components=2)
    info = msm.feature_info
    assert info["columns"] == ["TIC1", "TIC2"]
    assert info["periodic"] == [False, False]
    assert "tica" in info and msm.features[0].shape[1] == 2


def test_bootstrap_errors_use_analysis_temperature():
    """dG error bars share build_msm's kT (not a hardcoded 300 K)."""
    from pmarlo_tpu.msm.enhanced import EnhancedMSM

    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (500, 2)).astype(np.float32)

    def build(T_K):
        m = EnhancedMSM(temperature_K=T_K)
        m.load_trajectories([X])
        m.compute_features()
        m.cluster_features(n_states=3, seed=0)
        m.build_msm(lag_time=2)
        return m._bootstrap_free_energy_errors(n_boot=50, seed=0)

    e300, e600 = build(300.0), build(600.0)
    np.testing.assert_allclose(e600, 2.0 * e300, rtol=1e-6)


def test_fes_result_json_roundtrips_uncertainty(tmp_path):
    from pmarlo_tpu.msm.free_energy import FESResult, generate_2d_fes

    rng = np.random.default_rng(2)
    fes = generate_2d_fes(rng.normal(size=300), rng.normal(size=300),
                          bins=8)
    assert fes.uncertainty is not None
    d = fes.to_dict()
    back = FESResult.from_dict(d)
    np.testing.assert_allclose(
        np.nan_to_num(back.uncertainty, nan=-1.0),
        np.nan_to_num(fes.uncertainty, nan=-1.0), rtol=1e-12,
    )


def test_lag_selector_perfect_ck_error_scores_best():
    """ck_error == 0.0 is a PERFECT score, not a falsy miss."""
    from pmarlo_tpu.msm.ck_its_selector import _lag_score

    s_perfect = _lag_score(0.0, 1.0, 10.0, True)
    s_small = _lag_score(0.05, 1.0, 10.0, True)
    assert s_perfect > s_small
    # and a perfect error beats the None fallback by the full 10x weight
    assert s_perfect - _lag_score(None, 1.0, 10.0, True) == 10.0


def test_silhouette_singleton_scores_zero_and_kmeans_degenerate():
    from pmarlo_tpu.msm.clustering import cluster_microstates, silhouette_score

    rng = np.random.default_rng(0)
    # two tight clusters + one extreme outlier forced into a singleton
    X = np.concatenate([
        rng.normal(0, 0.1, (50, 2)), rng.normal(5, 0.1, (50, 2)),
        [[100.0, 100.0]],
    ]).astype(np.float32)
    labels = np.asarray([0] * 50 + [1] * 50 + [2])
    s3 = silhouette_score(X, labels, n_states=3)
    # sklearn scores the singleton 0; a (b-a)/b == 1 bonus would push
    # the 3-cluster mean ABOVE the honest 2-cluster structure
    assert s3 < 0.99
    # fewer distinct points than k: must not crash or emit NaN centers
    Xd = np.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]] * 30,
                    dtype=np.float32)
    res = cluster_microstates(Xd, n_states=5, seed=0)
    assert np.asarray(res.labels).shape[0] == 90
    assert np.isfinite(res.centers).all()
