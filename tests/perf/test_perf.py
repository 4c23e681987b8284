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


def test_perf_fused_metadynamics_ledger_writes():
    """Regression pin for the Mosaic hills-ledger write cliff (round-1
    note: ledger-writing kernels once ran 260 us/step vs 7.8 us
    read-only). Requires a real TPU in addition to PMARLO_RUN_PERF=1."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("ledger-write perf is a Mosaic/TPU property")
    import jax.numpy as jnp

    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.features.builtins import phi_psi_indices
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.pallas_md import build_pallas_chunk
    from pmarlo_tpu.md.topology import build_topology
    from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica

    topo = build_topology(alanine_dipeptide_structure())
    system, pos = build_system(topo)
    R, steps = 32, 1000
    x = jnp.broadcast_to(pos[None], (R, system.n_atoms, 3)).astype(jnp.float32)
    v = jnp.zeros_like(x)
    seeds = jnp.arange(R, dtype=jnp.int32)
    temps = jnp.full((R,), 300.0, jnp.float32)

    def timed_chunk(chunk, *extra):
        out = chunk(x, v, seeds, temps, *extra)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(3):
            out = chunk(x, v, seeds, temps, *extra)
        jax.block_until_ready(out[0])
        return (time.perf_counter() - t0) / 3

    plain = build_pallas_chunk(
        system, dt=0.002, friction=1.0, n_steps=steps, n_replicas=R
    )
    t_plain = timed_chunk(plain)

    rng = np.random.default_rng(0)
    model = train_deeptica(
        rng.normal(size=(4000, 4)).astype(np.float32),
        DeepTICAConfig(lag=5, n_out=2, hidden=(8,), max_epochs=3,
                       batch_size=512, seed=0),
    )
    phi_q, psi_q, _ = phi_psi_indices(topo.atom_names, topo.residue_ids)
    quads = np.concatenate([phi_q, psi_q])[:2]
    H = 1024
    mtd = build_pallas_chunk(
        system, dt=0.002, friction=1.0, n_steps=steps, n_replicas=R,
        bias_model=model, bias_quads=quads, bias_kind="metadynamics",
        mtd_sigma=np.array([0.3, 0.3]), mtd_deposit_interval=100,
        mtd_height=1.0, mtd_bias_factor=8.0, mtd_temperature_K=300.0,
    )
    cT = jnp.zeros((2, H), jnp.float32)
    hts = jnp.zeros((1, H), jnp.float32)
    cnt = jnp.zeros((1, 1), jnp.float32)
    t_mtd = timed_chunk(mtd, cT, hts, cnt)
    ratio = t_mtd / t_plain
    # the 30x cliff (ledger carried through the MD loop) must stay fixed;
    # deposits every 100 steps should cost well under 6x the plain chunk
    assert ratio < 6.0, (
        f"fused-metadynamics overhead {ratio:.1f}x vs plain chunk "
        f"({t_mtd / steps * 1e6:.1f} vs {t_plain / steps * 1e6:.1f} us/step)"
    )
