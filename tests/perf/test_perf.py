"""Performance micro-benchmarks, gated by PMARLO_RUN_PERF=1.

Mirrors the reference's perf suite pattern (tests/perf/, 8 files, gated by
PMARLO_RUN_PERF, README.md:106-115): wall-clock budgets for the hot
analysis paths on the CPU backend. These are coarse regression tripwires —
bench.py on real hardware is the authoritative number.
"""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PMARLO_RUN_PERF") != "1",
    reason="set PMARLO_RUN_PERF=1 to run perf benchmarks",
)


def _timed(fn, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def test_perf_counting():
    from pmarlo_tpu.msm.counting import counts_from_dtrajs

    rng = np.random.default_rng(0)
    dtrajs = [rng.integers(0, 50, 400) for _ in range(35)]
    counts_from_dtrajs(dtrajs, 10, 50)  # warm-up/compile
    assert _timed(lambda: counts_from_dtrajs(dtrajs, 10, 50)) < 0.5


def test_perf_kmeans():
    from pmarlo_tpu.msm.clustering import kmeans

    rng = np.random.default_rng(0)
    X = rng.normal(size=(13_000, 4)).astype(np.float32)
    kmeans(X, 50, seed=0, n_iter=10)
    assert _timed(lambda: kmeans(X, 50, seed=0, n_iter=50)) < 5.0


def test_perf_fes():
    from pmarlo_tpu.msm.free_energy import generate_2d_fes

    rng = np.random.default_rng(0)
    x = rng.normal(size=13_000)
    y = rng.normal(size=13_000)
    assert _timed(lambda: generate_2d_fes(x, y, bins=32)) < 2.0


def test_perf_md_step_throughput():
    import jax

    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import run_md, thermalize

    system, pos = build_system(alanine_dipeptide_structure())
    state = thermalize(system, pos, jax.random.PRNGKey(0), 300.0)
    run_md(system, state, n_steps=100, dt=0.002, friction=1.0,
           temperature_K=300.0, report_interval=100)  # compile
    wall = _timed(lambda: jax.block_until_ready(run_md(
        system, state, n_steps=1000, dt=0.002, friction=1.0,
        temperature_K=300.0, report_interval=1000,
    )[0].positions), repeat=2)
    # CPU budget; the TPU path is benchmarked by bench.py
    assert wall / 1000 < 5e-3, f"{wall / 1000 * 1e6:.0f} us/step on CPU"


def test_perf_whitening():
    from pmarlo_tpu.ml.whitening import apply_output_transform, estimate_whitening

    rng = np.random.default_rng(0)
    Y = rng.normal(size=(13_000, 4))
    meta = estimate_whitening(Y)
    assert _timed(lambda: apply_output_transform(Y, meta)) < 0.2


def test_perf_discretize():
    from pmarlo_tpu.analysis.discretize import discretize_dataset

    rng = np.random.default_rng(0)
    shards = [
        {"features": rng.normal(size=(370, 4)).astype(np.float32)}
        for _ in range(35)
    ]
    discretize_dataset(shards, n_states=50, lag=10, seed=0)
    assert _timed(
        lambda: discretize_dataset(shards, n_states=50, lag=10, seed=0),
        repeat=2,
    ) < 8.0
