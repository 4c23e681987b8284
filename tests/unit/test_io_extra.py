"""I/O edge cases: model bundle export, trajectory spill/merge,
reader probing, format dispatch (reference io/export.py:14,
io/trajectory_reader.py)."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pmarlo_tpu.io.export import export_deeptica_bundle, load_deeptica_bundle
from pmarlo_tpu.io.trajectory import (
    TrajectoryReader,
    TrajectoryWriter,
    get_reader,
    iterload,
)


@pytest.fixture(scope="module")
def tiny_model():
    from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica

    rng = np.random.default_rng(0)
    X = rng.normal(size=(600, 3)).astype(np.float32)
    X[:, 0] = np.cumsum(X[:, 0]) * 0.05
    return train_deeptica(
        [X], DeepTICAConfig.small_data(lag=2, n_out=1, max_epochs=3)
    ), X


def test_bundle_roundtrip(tiny_model, tmp_path):
    model, X = tiny_model
    out = export_deeptica_bundle(
        model, tmp_path / "bundle", extra_metadata={"run": "t"}
    )
    import json

    manifest = json.loads((out / "deeptica.bundle.json").read_text())
    assert manifest["format"].startswith("pmarlo_tpu.deeptica_bundle")
    assert manifest["metadata"] == {"run": "t"}
    assert (out / manifest["files"]["weights"]).exists()
    loaded = load_deeptica_bundle(out)
    np.testing.assert_allclose(
        model.transform(X[:32]), loaded.transform(X[:32]), atol=0.0
    )


def test_trajectory_spill_and_merge(tmp_path):
    path = tmp_path / "t.npz"
    frames = np.arange(5 * 4 * 3, dtype=np.float32).reshape(5, 4, 3)
    with TrajectoryWriter(path, flush_interval=2) as w:
        for f in frames:
            w.write_frames(f[None])
    back = TrajectoryReader(path).load()
    np.testing.assert_allclose(back, frames)


def test_reader_probe_without_full_load(tmp_path):
    path = tmp_path / "t.npz"
    frames = np.zeros((7, 3, 3), dtype=np.float32)
    with TrajectoryWriter(path) as w:
        w.write_frames(frames)
    r = TrajectoryReader(path)
    assert r.probe_length() == 7


def test_iterload_chunks(tmp_path):
    path = tmp_path / "t.npz"
    frames = np.random.default_rng(0).normal(
        size=(10, 2, 3)).astype(np.float32)
    with TrajectoryWriter(path) as w:
        w.write_frames(frames)
    chunks = list(iterload(path, chunk=4))
    assert [c.shape[0] for c in chunks] == [4, 4, 2]
    np.testing.assert_allclose(np.concatenate(chunks), frames)


def test_get_reader_dispatch(tmp_path):
    npz = tmp_path / "a.npz"
    with TrajectoryWriter(npz) as w:
        w.write_frames(np.zeros((2, 3, 3), dtype=np.float32))
    assert get_reader(npz).load().shape == (2, 3, 3)
    with pytest.raises(Exception):
        get_reader(tmp_path / "missing.xyz_unknown")


def test_writer_rejects_bad_shapes(tmp_path):
    with TrajectoryWriter(tmp_path / "t.npz") as w:
        w.write_frames(np.zeros((1, 3, 3), dtype=np.float32))
        with pytest.raises(Exception):
            w.write_frames(np.zeros((1, 4, 3), dtype=np.float32))
