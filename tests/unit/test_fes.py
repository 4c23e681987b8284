"""FES math: adaptive grid, periodicity, smoothing, serialization."""

import numpy as np
import pytest

from pmarlo_tpu.msm.fes_smoothing import (
    fes_uncertainty,
    gaussian_smooth_2d,
    trigamma,
)
from pmarlo_tpu.msm.free_energy import (
    FESResult,
    free_energy_from_density,
    generate_1d_pmf,
    generate_2d_fes,
    periodic_kde_2d,
)
from pmarlo_tpu.utils.thermodynamics import kT_kJ_per_mol


def test_trigamma_against_known_values():
    # psi'(1) = pi^2/6; psi'(2) = pi^2/6 - 1
    assert abs(trigamma(np.array([1.0]))[0] - np.pi**2 / 6) < 1e-8
    assert abs(trigamma(np.array([2.0]))[0] - (np.pi**2 / 6 - 1)) < 1e-8


def test_fes_uncertainty_decreases_with_counts():
    kT = kT_kJ_per_mol(300.0)
    u = fes_uncertainty(np.array([[1.0, 100.0], [10.0, 1000.0]]), kT)
    assert u[0, 0] > u[0, 1] > u[1, 1]


def test_free_energy_from_density_masks_empty():
    F = free_energy_from_density(np.array([[1.0, 0.0], [2.0, 1.0]]), 300.0)
    assert np.isnan(F[0, 1])
    assert F[1, 0] == 0.0  # the max-density bin is the minimum


def test_generate_2d_fes_double_well():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(-1, 0.2, 8000), rng.normal(1, 0.2, 8000)])
    y = rng.normal(0, 0.3, 16000)
    fes = generate_2d_fes(x, y, temperature_K=300.0, bins=32)
    assert fes.finite_fraction > 0.3
    # two minima at x ~ +-1 should have similar low F
    centers = 0.5 * (fes.xedges[:-1] + fes.xedges[1:])
    i_left = np.argmin(np.abs(centers + 1))
    i_right = np.argmin(np.abs(centers - 1))
    row_left = np.nanmin(fes.free_energy[i_left])
    row_right = np.nanmin(fes.free_energy[i_right])
    assert row_left < 2.0 and row_right < 2.0


def test_fes_periodic_wrapping():
    rng = np.random.default_rng(1)
    # samples just past the boundary must wrap, not expand the grid
    phi = np.concatenate([rng.normal(np.pi - 0.05, 0.2, 2000)])
    psi = rng.uniform(-np.pi, np.pi, 2000)
    fes = generate_2d_fes(
        phi, psi, bins=24, periodic=(True, True), smoothing_mode="never"
    )
    assert fes.xedges[0] == pytest.approx(-np.pi)
    assert fes.xedges[-1] == pytest.approx(np.pi)
    # mass split between the first and last x rows (wrap-around)
    assert fes.counts[0].sum() > 0 and fes.counts[-1].sum() > 0


def test_fes_roundtrip_json(tmp_path):
    rng = np.random.default_rng(2)
    fes = generate_2d_fes(rng.normal(size=500), rng.normal(size=500), bins=12)
    path = fes.save(tmp_path / "fes.json")
    loaded = FESResult.load(path)
    np.testing.assert_allclose(
        np.nan_to_num(loaded.free_energy), np.nan_to_num(fes.free_energy), rtol=1e-6
    )


def test_sparse_warning():
    rng = np.random.default_rng(3)
    x = rng.normal(size=30)
    fes = generate_2d_fes(x, x, bins=64, smoothing_mode="never",
                          min_finite_fraction=0.0)
    assert fes.sparse_warning is not None


def test_invalid_smoothing_mode():
    with pytest.raises(ValueError, match="smoothing_mode"):
        generate_2d_fes(np.zeros(10), np.zeros(10), smoothing_mode="sometimes")


def test_1d_pmf_double_well():
    rng = np.random.default_rng(4)
    x = np.concatenate([rng.normal(-1, 0.15, 5000), rng.normal(1, 0.15, 5000)])
    pmf = generate_1d_pmf(x, temperature_K=300.0, bins=40)
    centers = 0.5 * (pmf.edges[:-1] + pmf.edges[1:])
    mid = np.argmin(np.abs(centers))
    # barrier: high F, or NaN when the bin is entirely unsampled (masked)
    barrier = pmf.free_energy[mid]
    assert np.isnan(barrier) or barrier > 3.0
    # the wells themselves are low
    for target in (-1.0, 1.0):
        well = np.argmin(np.abs(centers - target))
        assert pmf.free_energy[well] < 1.0


def test_periodic_gaussian_smooth_conserves_mass():
    H = np.zeros((16, 16))
    H[0, 0] = 100.0
    out = gaussian_smooth_2d(H, 2.0, periodic=(True, True))
    assert abs(out.sum() - 100.0) < 1e-8
    assert out[-1, -1] > 0  # wrapped
