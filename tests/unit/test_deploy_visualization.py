"""deploy_worker fan-out modes + visualization plot surface — thin-module
coverage (VERDICT round-1 weak item 7)."""

import json

import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")

from pmarlo_tpu import deploy_worker
from pmarlo_tpu.visualization import plots as P


def test_deploy_worker_msm_mode(tmp_path):
    result = deploy_worker.run_mode(2, tmp_path)  # msm_35_shards
    assert result["mode"] == "msm_35_shards"
    assert result["status"] == "completed"
    assert result["counted_pairs"] > 0
    saved = json.loads((tmp_path / "mode_2.json").read_text())
    assert saved["mode"] == "msm_35_shards"


def test_deploy_worker_tpt_mode(tmp_path):
    result = deploy_worker.run_mode(5, tmp_path)  # tpt_conformations
    assert result["status"] == "completed"
    assert result["n_conformations"] >= 1


@pytest.mark.slow
def test_deploy_worker_deeptica_mode(tmp_path):
    result = deploy_worker.run_mode(4, tmp_path)
    assert result["status"] == "completed"
    assert np.isfinite(result["best_vamp2"])


def test_deploy_worker_index_wraps(tmp_path):
    # completion index beyond len(MODES) wraps (k8s Indexed Job semantics)
    result = deploy_worker.run_mode(len(deploy_worker.MODES) + 2, tmp_path)
    assert result["mode"] == deploy_worker.MODES[2][0]


@pytest.fixture(scope="module")
def fes_its_tpt():
    from pmarlo_tpu.msm.free_energy import generate_2d_fes
    from pmarlo_tpu.msm.its import ITSResult
    from pmarlo_tpu.msm.tpt import reactive_flux

    rng = np.random.default_rng(1)
    fes = generate_2d_fes(rng.normal(size=3000), rng.normal(size=3000),
                          temperature_K=300.0, bins=20)
    its = ITSResult(
        lags=np.array([1, 2, 5]), timescales=rng.uniform(5, 50, (3, 2)),
        ci_lower=np.ones((3, 2)), ci_upper=np.full((3, 2), 60.0), n_samples=20,
        plateau_lag=2,
    )
    T = np.array([[0.9, 0.1, 0.0], [0.05, 0.9, 0.05], [0.0, 0.1, 0.9]])
    tpt = reactive_flux(T, [0], [2])
    return fes, its, tpt


def test_plot_surface_smoke(fes_its_tpt, tmp_path):
    """Every figure-producing entry point renders and saves a PNG."""
    fes, its, tpt = fes_its_tpt
    outputs = {
        "fes": P.plot_fes(fes, tmp_path / "fes.png"),
        "its": P.plot_its(its, tmp_path / "its.png"),
        "committors": P.plot_committors(tpt, tmp_path / "q.png"),
        "flux": P.plot_flux_network(tpt, path=tmp_path / "flux.png"),
        "pathways": P.plot_pathways(tpt, tmp_path / "paths.png"),
        "tpt_summary": P.plot_tpt_summary(tpt, tmp_path / "tpt.png"),
        "rama": P.plot_ramachandran(
            np.random.uniform(-180, 180, 500),
            np.random.uniform(-180, 180, 500),
            tmp_path / "rama.png",
        ),
    }
    assert len(outputs) == 7
    pngs = list(tmp_path.glob("*.png"))
    assert len(pngs) == 7
    for png in pngs:
        assert png.stat().st_size > 2000, png


def test_plot_fes_requires_data():
    with pytest.raises(ValueError):
        P.plot_fes(None)
    with pytest.raises(ValueError):
        P.plot_its(None)


def test_plot_fes_1d(tmp_path):
    import numpy as np

    from pmarlo_tpu.msm.free_energy import generate_1d_pmf
    from pmarlo_tpu.visualization.plots import plot_fes_1d

    rng = np.random.default_rng(0)
    cv = np.concatenate([rng.normal(-1, 0.2, 3000), rng.normal(1, 0.2, 3000)])
    pmf = generate_1d_pmf(cv, temperature_K=300.0, bins=40)
    out = plot_fes_1d(pmf, tmp_path / "pmf.png")
    assert (tmp_path / "pmf.png").exists()
