"""Workflow pipeline, file-level demux, profiling utilities."""

import numpy as np
import pytest

from pmarlo_tpu.remd.demux import demux_frames, demux_trajectory_files, remux_frames
from pmarlo_tpu.utils.profiling import StageTimer, device_memory_stats
from pmarlo_tpu.workflow import Pipeline, RunStatus


def test_pipeline_stages_and_resume(tmp_path):
    calls = []
    pipe = Pipeline("test", checkpoint=tmp_path / "ck.json")
    pipe.add("a", lambda ctx: calls.append("a") or {"x": 1})
    pipe.add("b", lambda ctx: calls.append("b") or {"y": ctx["x"] + 1})
    ctx = pipe.run({})
    assert ctx["y"] == 2
    assert calls == ["a", "b"]
    # resume: completed stages skip
    pipe2 = Pipeline("test", checkpoint=tmp_path / "ck.json")
    pipe2.add("a", lambda ctx: calls.append("a2"))
    pipe2.add("b", lambda ctx: calls.append("b2"))
    pipe2.run({})
    assert calls == ["a", "b"]  # nothing re-ran
    assert all(r.status == RunStatus.SKIPPED for r in pipe2.results)


def test_pipeline_failure_recorded(tmp_path):
    pipe = Pipeline("fail", checkpoint=tmp_path / "ck.json")
    pipe.add("boom", lambda ctx: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        pipe.run({})
    assert pipe.results[0].status == RunStatus.FAILED
    assert "ZeroDivisionError" in pipe.results[0].error


def test_pipeline_duplicate_stage():
    pipe = Pipeline("dup")
    pipe.add("s", lambda ctx: None)
    with pytest.raises(ValueError, match="duplicate"):
        pipe.add("s", lambda ctx: None)


def test_demux_remux_inverse():
    rng = np.random.default_rng(0)
    F, R, N = 12, 4, 5
    rung_frames = rng.normal(size=(F, R, N, 3)).astype(np.float32)
    # random permutation history: 4 attempts (ids[0] = identity)
    ids = [np.arange(R)]
    for _ in range(4):
        ids.append(rng.permutation(R))
    ids = np.asarray(ids)
    replica_frames = remux_frames(rung_frames, ids, frames_per_attempt=3)
    back = demux_frames(replica_frames, ids, frames_per_attempt=3)
    np.testing.assert_array_equal(back, rung_frames)


def test_demux_trajectory_files(tmp_path):
    from pmarlo_tpu.io.trajectory import TrajectoryReader, TrajectoryWriter

    rng = np.random.default_rng(1)
    F, R, N = 8, 3, 4
    replica_frames = rng.normal(size=(F, R, N, 3)).astype(np.float32)
    files = []
    for r in range(R):
        p = tmp_path / f"replica_{r}.npz"
        with TrajectoryWriter(p) as w:
            w.write_frames(replica_frames[:, r])
        files.append(p)
    ids = np.asarray([[0, 1, 2], [1, 0, 2], [1, 2, 0]])
    out = demux_trajectory_files(
        files, ids, [300.0, 350.0, 400.0], tmp_path / "demux",
        frames_per_attempt=4,
    )
    assert len(out) == 3
    demuxed = TrajectoryReader(out[0]).load()
    expected = demux_frames(replica_frames, ids, frames_per_attempt=4)[:, 0]
    np.testing.assert_allclose(demuxed, expected)


def test_stage_timer():
    import jax.numpy as jnp

    timer = StageTimer()
    with timer.stage("compute", n_items=10) as box:
        box["out"] = jnp.ones((100, 100)).sum()
    summary = timer.summary()
    assert summary[0]["stage"] == "compute"
    assert summary[0]["wall_s"] >= 0
    assert "throughput_per_s" in summary[0]
    assert timer.total() > 0
    assert isinstance(device_memory_stats(), dict)


def test_dcd_via_trajectory_reader(tmp_path):
    from pmarlo_tpu.io.dcd import write_dcd
    from pmarlo_tpu.io.trajectory import TrajectoryReader

    coords = np.random.rand(4, 6, 3).astype(np.float32)
    path = write_dcd(tmp_path / "t.dcd", coords)
    r = TrajectoryReader(path)
    assert r.probe_length() == 4
    np.testing.assert_allclose(r.load(), coords, atol=1e-5)
    assert r.metadata()["format"] == "dcd"


def test_pipeline_resume_replays_context_and_survives_rerun(tmp_path):
    """A skipped stage's recorded context updates must be REPLAYED (a
    downstream stage consumes them), and a resumed run must not degrade
    the checkpoint for the NEXT resume."""
    from pmarlo_tpu.workflow.pipeline import Pipeline

    ckpt = tmp_path / "pipe.json"
    calls = {"a": 0, "b": 0}

    def stage_a(ctx):
        calls["a"] += 1
        return {"x": 41}

    def stage_b(ctx):
        calls["b"] += 1
        if calls["b"] == 1:
            raise RuntimeError("first attempt fails")
        return {"y": ctx["x"] + 1}   # consumes stage a's output

    def build():
        return (Pipeline("p", checkpoint=ckpt)
                .add("a", stage_a).add("b", stage_b))

    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        build().run({})
    # resume 1: 'a' skipped but its {"x": 41} replayed; 'b' succeeds
    ctx = build().run({})
    assert ctx["y"] == 42
    assert calls["a"] == 1
    # resume 2: BOTH stages still skip (the previous resume must not
    # have rewritten 'a' into a non-resumable status)
    ctx = build().run({})
    assert calls["a"] == 1 and calls["b"] == 2
    assert ctx["y"] == 42


def test_remd_checkpoint_mode_mismatch_raises(tmp_path, alanine_system):
    """A checkpoint from a constrained/overridden run must refuse to
    resume on the default physics (silently different simulation)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from pmarlo_tpu.md.integrate import make_force_fn
    from pmarlo_tpu.remd.checkpoint import load_checkpoint, save_checkpoint
    from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

    system, positions, _ = alanine_system
    cfg = RemdConfig(n_replicas=2, t_min=300, t_max=400,
                     exchange_frequency=25, report_interval=25, seed=1)
    fn = make_force_fn(system, None, analytic=True)
    remd = ReplicaExchange(system, jnp.asarray(positions), cfg,
                           force_fn=fn, minimize=False)
    remd.run(n_steps=25)
    path = save_checkpoint(remd, tmp_path / "ck.npz")
    with _pytest.raises(ValueError, match="physics modes"):
        load_checkpoint(path, system)          # no force_fn supplied
    # matching modes restore fine and continue
    remd2, hills, _ = load_checkpoint(path, system, force_fn=fn)
    res = remd2.run(n_steps=25)
    assert res.positions.shape[1] == 2


def test_pipeline_resume_reruns_lossy_stages(tmp_path):
    """A stage whose outputs cannot round-trip through the JSON
    checkpoint (arrays, live objects) must RE-RUN on resume — replaying
    str(obj)/list-ified reprs would silently corrupt downstream context."""
    import numpy as np

    from pmarlo_tpu.workflow.pipeline import Pipeline

    ckpt = tmp_path / "pipe.json"
    calls = {"a": 0, "b": 0}

    def stage_a(ctx):
        calls["a"] += 1
        return {"arr": np.arange(4, dtype=np.float32)}   # NOT json-clean

    def stage_b(ctx):
        calls["b"] += 1
        if calls["b"] == 1:
            raise RuntimeError("first attempt fails")
        # downstream consumes the LIVE array: .dtype only exists if the
        # stage re-ran (a replayed checkpoint value would be a list)
        return {"total": float(ctx["arr"].sum())}

    def build():
        return (Pipeline("p", checkpoint=ckpt)
                .add("a", stage_a).add("b", stage_b))

    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        build().run({})
    ctx = build().run({})
    assert ctx["total"] == 6.0
    assert calls["a"] == 2, "lossy stage must re-run, not replay"
