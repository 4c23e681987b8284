"""Analysis layer: discretize accounting, whitening prep, diagnostics."""

import numpy as np
import pytest

from pmarlo_tpu.analysis.debug_export import compute_analysis_debug
from pmarlo_tpu.analysis.diagnostics import (
    cca_similarity,
    compute_diagnostics,
    integrated_autocorrelation_time,
)
from pmarlo_tpu.analysis.discretize import discretize_dataset
from pmarlo_tpu.analysis.msm import (
    ensure_msm_inputs_whitened,
    prepare_msm_discretization,
)
from pmarlo_tpu.analysis.validation import validate_features
from pmarlo_tpu.ml.whitening import estimate_whitening
from pmarlo_tpu.utils.errors import NoAssignmentsError, WhiteningError


def _make_dataset(n_shards=5, frames=200, seed=0):
    rng = np.random.default_rng(seed)
    shards = []
    for i in range(n_shards):
        # two-cluster features
        half = frames // 2
        X = np.concatenate([
            rng.normal(-1, 0.2, (half, 2)), rng.normal(1, 0.2, (frames - half, 2))
        ]).astype(np.float32)
        rng.shuffle(X)
        shards.append({
            "features": X,
            "metadata": {"stride": 1, "temperature_K": 300.0},
        })
    return shards


@pytest.mark.slow
def test_discretize_accounting():
    shards = _make_dataset()
    result = discretize_dataset(shards, n_states=4, lag=2, seed=0)
    assert result.counted_pairs == result.expected_pair_count
    assert result.segment_lengths == [200] * 5
    assert result.transition_matrix.shape == (4, 4)
    assert 0 < result.diag_mass <= 1
    assert result.schema_fingerprint


def test_discretize_rejects_mixed_schema():
    shards = _make_dataset(2)
    shards[1]["features"] = np.random.rand(50, 3).astype(np.float32)
    with pytest.raises(NoAssignmentsError, match="mixed feature schemas"):
        discretize_dataset(shards, n_states=4, lag=1)


def test_discretize_rejects_nonfinite():
    shards = _make_dataset(1)
    shards[0]["features"][3, 1] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        discretize_dataset(shards, n_states=4, lag=1)


@pytest.mark.slow
def test_low_count_pruning():
    shards = _make_dataset(1, frames=100)
    result = discretize_dataset(shards, n_states=8, lag=1, min_state_count=5)
    # pruned states became -1 in dtrajs
    for s in result.pruned_states:
        for d in result.dtrajs:
            assert not (d == s).any()


def test_whitening_prep():
    shards = _make_dataset(2)
    Y = np.concatenate([s["features"] for s in shards])
    wh = estimate_whitening(Y)
    result = prepare_msm_discretization(shards, whitening=wh, n_states=4, lag=1)
    assert result.artifacts["whitening_applied"]
    # mixing applied + unapplied shards is rejected
    prepared = ensure_msm_inputs_whitened(shards, wh)
    mixed = [prepared[0], shards[1]]
    with pytest.raises(WhiteningError, match="mixes"):
        ensure_msm_inputs_whitened(mixed, wh)


def test_debug_export(tmp_path, double_well_dtrajs):
    dtrajs, _ = double_well_dtrajs
    debug = compute_analysis_debug(dtrajs, lag=5, output_json=tmp_path / "d.json")
    assert (tmp_path / "d.json").exists()
    assert debug.total_counts > 0
    assert 0 < debug.diag_mass <= 1
    assert debug.scc["n_components"] >= 1
    assert len(debug.occupancy) == debug.n_states


def test_diag_mass_decreases_with_lag(double_well_dtrajs):
    """Physical invariant from the reference's synthetic test
    (tests/integration/test_msm_synthetic.py:11-68)."""
    dtrajs, _ = double_well_dtrajs
    masses = [
        compute_analysis_debug(dtrajs, lag=l).diag_mass for l in (1, 5, 20)
    ]
    assert masses[0] > masses[1] > masses[2]


def test_autocorrelation_time():
    rng = np.random.default_rng(0)
    white = rng.normal(size=5000)
    assert integrated_autocorrelation_time(white) < 2.0
    # AR(1) with rho=0.9: tau_int = (1+rho)/(1-rho) = 19
    x = np.zeros(50_000)
    for t in range(1, len(x)):
        x[t] = 0.9 * x[t - 1] + rng.normal()
    tau = integrated_autocorrelation_time(x)
    assert 12 < tau < 28


def test_diagnostics_result(double_well_dtrajs):
    _, xs = double_well_dtrajs
    shards = [x[:, None] for x in xs]
    diag = compute_diagnostics(shards)
    assert diag.n_segments == 3
    assert diag.recommended_lag_range[0] >= 2
    assert diag.max_usable_lag == min(len(x) for x in xs) // 3


def test_cca_similarity():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(1000, 2))
    Y = X @ rng.normal(size=(2, 2))  # same subspace
    corrs = cca_similarity(X, Y)
    assert corrs[0] > 0.99
    Z = rng.normal(size=(1000, 2))
    corrs2 = cca_similarity(X, Z)
    assert corrs2[0] < 0.2


def test_validate_features_messages():
    with pytest.raises(ValueError, match="2D"):
        validate_features(np.zeros(5))
    with pytest.raises(ValueError, match="empty"):
        validate_features(np.zeros((0, 3)))


def test_export_analysis_debug_directory(tmp_path, double_well_dtrajs):
    import json

    from pmarlo_tpu.analysis.debug_export import export_analysis_debug

    dtrajs, _ = double_well_dtrajs
    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(len(d), 3)) for d in dtrajs]
    out = export_analysis_debug(
        dtrajs, lag=5, output_dir=tmp_path / "dbg",
        features=feats, extra_metadata={"run": "test"},
    )
    summary = json.loads((out / "summary.json").read_text())
    assert summary["lag"] == 5
    assert summary["feature_stats"]["n_features"] == 3
    assert summary["metadata"] == {"run": "test"}
    with np.load(out / "core_arrays.npz") as z:
        assert "counts" in z and "dtraj_0000" in z
        assert z["counts"].sum() > 0


def test_grid_discretization():
    from pmarlo_tpu.analysis.discretize import GridDiscretizer, discretize_dataset

    rng = np.random.default_rng(0)
    X = np.concatenate([
        rng.normal(-1, 0.2, (3000, 2)), rng.normal(1, 0.2, (3000, 2)),
    ]).astype(np.float32)
    rng.shuffle(X)
    res = discretize_dataset(
        [{"features": X[:3000]}, {"features": X[3000:]}],
        n_states=25, lag=5, method="grid",
    )
    assert res.artifacts["method"] == "grid"
    # occupied-cell count <= requested grid size, > 1
    assert 1 < res.n_states <= 25
    assert res.counted_pairs > 0
    # transform maps unseen points outside the fitted range to -1
    g = GridDiscretizer(16).fit(X)
    far = g.transform(np.array([[50.0, 50.0]]))
    assert far[0] == -1 or far[0] < g.n_states  # clipped edge cell or -1


def test_grid_discretizer_centers_shape():
    from pmarlo_tpu.analysis.discretize import GridDiscretizer

    rng = np.random.default_rng(1)
    X = rng.normal(size=(500, 3))
    g = GridDiscretizer(27).fit(X)
    assert g.centers.shape == (g.n_states, 3)
    labels = g.transform(X)
    assert labels.min() >= 0 and labels.max() < g.n_states


def test_unknown_method_raises():
    from pmarlo_tpu.analysis.discretize import NoAssignmentsError, discretize_dataset

    with pytest.raises(NoAssignmentsError):
        discretize_dataset([{"features": np.zeros((100, 2))}], method="umap")
