"""Interactive HTML plots (the reference's plotly-mode replacement,
_plots.py:31,45: plotly Contour + write_html)."""

import json
import re

import numpy as np
import pytest

from pmarlo_tpu.msm.free_energy import FESResult
from pmarlo_tpu.msm.its import ITSResult
from pmarlo_tpu.visualization.interactive import fes_html, its_html, lines_html


@pytest.fixture
def fes():
    x = np.linspace(-np.pi, np.pi, 21)
    y = np.linspace(-np.pi, np.pi, 16)
    xc = 0.5 * (x[:-1] + x[1:])[:, None]
    yc = 0.5 * (y[:-1] + y[1:])[None, :]
    F = 3.0 * (1 - np.cos(xc)) + 2.0 * (1 - np.cos(yc))
    F[0, 0] = np.nan  # unsampled bin
    counts = np.exp(-F / 2.5)
    return FESResult(free_energy=F, xedges=x, yedges=y, counts=counts,
                     temperature_K=300.0, cv_names=("phi", "psi"))


@pytest.fixture
def its():
    lags = np.array([1, 2, 5, 10, 20, 50])
    ts = np.stack([100.0 / (1 + 5.0 / lags), 30.0 / (1 + 2.0 / lags)], axis=1)
    return ITSResult(lags=lags, timescales=ts, ci_lower=ts * 0.8,
                     ci_upper=ts * 1.25, n_samples=100, plateau_lag=20)


def test_fes_html_structure(tmp_path, fes):
    out = tmp_path / "fes.html"
    html = fes_html(fes, out)
    assert out.exists() and out.read_text() == html
    assert "<svg" in html and "data:image/png;base64," in html
    assert "phi" in html and "psi" in html
    assert "mousemove" in html  # hover layer present
    # embedded data round-trips and matches the FES (incl. the NaN bin)
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert data["F"][0][0] is None
    assert data["F"][3][4] == pytest.approx(fes.free_energy[3, 4], abs=1e-3)
    assert len(data["xe"]) == len(fes.xedges)


def test_fes_html_is_self_contained(fes):
    html = fes_html(fes)
    assert "http://" not in html and "https://" not in html  # zero external assets


def test_its_html(tmp_path, its):
    out = tmp_path / "its.html"
    html = its_html(its, out)
    assert out.exists()
    assert "Implied timescales" in html and "t1" in html and "t2" in html
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert data["logx"] is True
    assert data["ys"][0][0] == pytest.approx(its.timescales[0, 0], rel=1e-6)
    assert "<polygon" in html  # CI bands drawn


def test_lines_html_nan_handling(tmp_path):
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.array([1.0, np.nan, 3.0, 4.0])
    html = lines_html(x, [y], ["a"], path=tmp_path / "l.html")
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert data["ys"][0][1] is None  # NaN must serialize as null, not NaN


def test_enhanced_msm_interactive_flag(tmp_path, fes, its):
    from pmarlo_tpu.msm.enhanced import EnhancedMSM

    msm = EnhancedMSM(output_dir=tmp_path)
    msm.fes = fes
    msm.its = its
    msm.plot_free_energy_surface(interactive=True)
    msm.plot_implied_timescales(interactive=True)
    assert (tmp_path / "fes.html").exists()
    assert (tmp_path / "its.html").exists()
