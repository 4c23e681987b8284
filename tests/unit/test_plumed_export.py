"""PLUMED interop export (VERDICT r3 missing #5): a trained DeepTICA CV
must leave the framework as a TorchScript file + PLUMED snippet matching
the reference's contract (features/deeptica/_full.py:393-412), with the
traced module reproducing the JAX model exactly."""

import numpy as np
import pytest

import jax

from pmarlo_tpu.ml.deeptica import (
    DeepTICAConfig,
    DeepTICAModel,
    init_mlp_params,
)
from pmarlo_tpu.ml.plumed import plumed_snippet, to_torchscript

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(0)
    cfg = DeepTICAConfig(n_out=2, hidden=(16, 16), activation="tanh",
                         layernorm=True)
    params = init_mlp_params(jax.random.PRNGKey(0), 6, cfg.hidden,
                             cfg.n_out)
    return DeepTICAModel(
        config=cfg,
        params=params,
        scaler_mean=rng.normal(size=6),
        scaler_scale=rng.uniform(0.5, 2.0, size=6),
        whitening={
            "mean": rng.normal(size=2),
            "transform": rng.normal(size=(2, 2)),
        },
    )


def test_torchscript_matches_jax(model, tmp_path):
    out = to_torchscript(model, tmp_path / "cv.pt")
    assert out.suffix == ".ts" and out.exists()
    ts = torch.jit.load(str(out))
    X = np.random.default_rng(1).normal(size=(40, 6)).astype(np.float32)
    want = model.transform(X)
    got = ts(torch.tensor(X)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_plumed_snippet_contract(model, tmp_path):
    snippet = plumed_snippet(model, tmp_path / "cv.pt")
    lines = snippet.strip().splitlines()
    assert lines[0] == "PYTORCH_MODEL FILE=cv.ts LABEL=mlcv"
    assert lines[1:] == ["CV VALUE=mlcv.node-0", "CV VALUE=mlcv.node-1"]


def test_export_without_whitening(model, tmp_path):
    import dataclasses

    bare = dataclasses.replace(model, whitening=None)
    out = to_torchscript(bare, tmp_path / "bare.pt")
    ts = torch.jit.load(str(out))
    X = np.zeros((3, 6), np.float32)
    np.testing.assert_allclose(
        ts(torch.tensor(X)).detach().numpy(), bare.transform(X), atol=1e-5)
