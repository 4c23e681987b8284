"""KDE FES surface + tau-grid derivation (reference analysis/fes.py:176,
analysis/diagnostics.py:398)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.analysis.diagnostics import derive_taus
from pmarlo_tpu.analysis.fes import (
    compute_bandwidth,
    compute_kde_fes,
    fes_from_dataset,
)


@pytest.fixture(scope="module")
def gaussian_cloud():
    rng = np.random.default_rng(0)
    return rng.normal(0, 1.0, 20_000), rng.normal(0, 0.5, 20_000)


def test_kde_fes_recovers_gaussian_well(gaussian_cloud):
    x, y = gaussian_cloud
    res = compute_kde_fes(x, y, bins=48, temperature_K=300.0)
    F = res.free_energy
    assert res.smoothing_mode == "kde"
    # corners can underflow to zero density; the bulk must be finite
    assert np.isfinite(F).mean() > 0.9
    # minimum at the density mode (origin)
    ix, iy = np.unravel_index(np.nanargmin(F), F.shape)
    xc = 0.5 * (res.xedges[ix] + res.xedges[ix + 1])
    yc = 0.5 * (res.yedges[iy] + res.yedges[iy + 1])
    assert abs(xc) < 0.3 and abs(yc) < 0.3
    # quadratic well: F at 1 sigma ~ 0.5 kT above minimum
    kT = 0.00831446261815324 * 300.0
    j = np.searchsorted(res.xedges, 1.0) - 1
    mid_y = np.nanargmin(F[ix])
    assert abs((F[j, mid_y] - F[ix, mid_y]) - 0.5 * kT) < 0.35 * kT


def test_kde_weights_shift_surface(gaussian_cloud):
    x, y = gaussian_cloud
    w = np.where(x > 0, 4.0, 1.0)
    res = compute_kde_fes(x, y, bins=32, weights=w)
    ix, _ = np.unravel_index(np.nanargmin(res.free_energy),
                             res.free_energy.shape)
    xc = 0.5 * (res.xedges[ix] + res.xedges[ix + 1])
    assert xc > 0  # reweighting pushes the minimum to the heavy side


def test_bandwidth_selectors():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 2.0, 5000)
    w = np.full(5000, 1 / 5000)
    scott = compute_bandwidth(x, w, 5000, "scott")
    silv = compute_bandwidth(x, w, 5000, "silverman")
    assert 0 < scott < 2.0 and 0 < silv < 2.0
    # d=2 Scott factor: std * n^(-1/6)
    assert abs(scott - x.std() * 5000 ** (-1 / 6)) < 0.05
    assert compute_bandwidth(x, w, 5000, 0.25) == 0.25
    with pytest.raises(ValueError):
        compute_bandwidth(x, w, 5000, -1.0)
    with pytest.raises(ValueError):
        compute_bandwidth(x, w, 5000, "epanechnikov")


def test_fes_from_dataset_kde_method(gaussian_cloud):
    x, y = gaussian_cloud
    shards = [{"features": np.stack([x[:5000], y[:5000]], 1)},
              {"features": np.stack([x[5000:10000], y[5000:10000]], 1)}]
    res = fes_from_dataset(shards, method="kde", bins=24)
    assert res.free_energy.shape == (24, 24)
    with pytest.raises(ValueError):
        fes_from_dataset(shards, method="spline")


def test_derive_taus_geometric():
    taus = derive_taus([3000, 1200], max_lags=8)
    assert taus[0] == 1
    assert taus == sorted(set(taus))
    assert taus[-1] <= 400  # 1/3 of the shortest segment
    assert len(taus) <= 8


def test_derive_taus_accepts_shards():
    shards = [{"features": np.zeros((900, 3))}, np.zeros((600, 3))]
    taus = derive_taus(shards, max_lags=5)
    assert taus[-1] <= 200


def test_derive_taus_base_filter():
    taus = derive_taus([100], geometric=False, base=[1, 5, 20, 500])
    assert taus == [1, 5, 20]  # 500 exceeds the segment
    with pytest.raises(ValueError):
        derive_taus([100], geometric=False, base=[5000])


def test_derive_taus_validation():
    with pytest.raises(ValueError):
        derive_taus([])
    with pytest.raises(ValueError):
        derive_taus([10], min_lag=50)
    with pytest.raises(ValueError):
        derive_taus([1000], fraction_max=0.0)
