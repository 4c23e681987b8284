"""Dashboard (webapp): artifact loading, HTML rendering, live serving.

Replaces the reference's Streamlit ``pmarlo_webapp`` (CHANGELOG.md —
sampling/training/msm_fes tabs over a run directory) with a
dependency-free renderer over save_analysis_results artifacts.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from pmarlo_tpu.webapp import RunArtifacts, export_static, render_html


@pytest.fixture()
def run_dir(tmp_path):
    from pmarlo_tpu.msm.free_energy import generate_2d_fes
    from pmarlo_tpu.msm.its import ITSResult

    rng = np.random.default_rng(0)
    cv1, cv2 = rng.normal(size=4000), rng.normal(size=4000)
    fes = generate_2d_fes(cv1, cv2, temperature_K=300.0, bins=24)
    fes.save(tmp_path / "fes.json")
    its = ITSResult(
        lags=np.array([1, 2, 5, 10]),
        timescales=rng.uniform(5, 50, (4, 3)),
        ci_lower=np.ones((4, 3)),
        ci_upper=np.full((4, 3), 60.0),
        n_samples=50,
    )
    (tmp_path / "its.json").write_text(json.dumps(its.to_dict()))
    (tmp_path / "ck.json").write_text(json.dumps({
        "lag": 5, "factors": [2, 3], "rms": {"2": 0.01, "3": 0.02},
        "max_error": 0.02, "insufficient_data": False,
    }))
    (tmp_path / "analysis_summary.json").write_text(
        json.dumps({"temperature_K": 300.0, "n_frames": 4000})
    )
    (tmp_path / "state_table.json").write_text(json.dumps([
        {"state": 0, "population": 0.4, "free_energy": 0.0},
        {"state": 1, "population": 0.6, "free_energy": -1.0},
    ]))
    np.save(tmp_path / "transition_matrix.npy",
            np.array([[0.9, 0.1], [0.2, 0.8]]))
    np.save(tmp_path / "stationary_distribution.npy", np.array([0.4, 0.6]))
    return tmp_path


def test_render_all_cards(run_dir):
    html_text = render_html(RunArtifacts.load(run_dir))
    for needle in ("Run summary", "Free-energy surface", "Implied timescales",
                   "Chapman-Kolmogorov", "MSM", "State table", "base64"):
        assert needle in html_text, needle


def test_export_static(run_dir, tmp_path):
    out = export_static(run_dir, tmp_path / "dash.html")
    assert out.exists() and out.stat().st_size > 10_000


def test_partial_artifacts_render(tmp_path):
    """A directory with only a summary still renders (missing artifacts
    are simply omitted — the live-watch use case)."""
    (tmp_path / "analysis_summary.json").write_text(
        json.dumps({"temperature_K": 300.0})
    )
    html_text = render_html(RunArtifacts.load(tmp_path))
    assert "Run summary" in html_text
    assert "Free-energy surface" not in html_text


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        RunArtifacts.load(tmp_path / "nope")


def test_serve_round_trip(run_dir):
    from pmarlo_tpu.webapp.app import serve

    port = 8799
    t = threading.Thread(
        target=lambda: serve(run_dir, port=port), daemon=True
    )
    t.start()
    deadline = time.time() + 10
    page = None
    while time.time() < deadline:
        try:
            page = urllib.request.urlopen(
                f"http://localhost:{port}", timeout=2
            ).read().decode()
            break
        except OSError:
            time.sleep(0.2)
    assert page and "pmarlo_tpu analysis dashboard" in page
