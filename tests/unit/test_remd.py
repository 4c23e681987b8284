"""REMD: ladder parsing, swap bookkeeping, determinism, short runs."""

import numpy as np
import pytest

from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange
from pmarlo_tpu.utils.input_parsing import (
    geometric_temperature_ladder,
    parse_temperature_ladder,
)


def test_ladder_parsing():
    assert parse_temperature_ladder("300,320,340") == [300.0, 320.0, 340.0]
    ladder = parse_temperature_ladder("300:600:4")
    assert len(ladder) == 4
    assert ladder[0] == pytest.approx(300) and ladder[-1] == pytest.approx(600)
    # geometric: constant ratio
    ratios = np.diff(np.log(ladder))
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-10)
    with pytest.raises(ValueError):
        parse_temperature_ladder("500,300")
    with pytest.raises(ValueError):
        parse_temperature_ladder("300:200:4")


def test_config_validation():
    with pytest.raises(ValueError, match="divide"):
        RemdConfig(exchange_frequency=100, report_interval=33)
    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=400)
    assert len(cfg.ladder()) == 4


@pytest.fixture(scope="module")
def short_remd(alanine_system_module):
    system, positions, _ = alanine_system_module
    cfg = RemdConfig(
        n_replicas=4, t_min=300, t_max=600, exchange_frequency=50,
        report_interval=50, seed=5,
    )
    remd = ReplicaExchange(system, positions, cfg, minimize=True)
    return remd.run(n_steps=1000)


@pytest.fixture(scope="module")
def alanine_system_module():
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    system, positions = build_system(topo)
    return system, positions, topo


def test_remd_shapes_and_stats(short_remd):
    res = short_remd
    assert res.positions.shape[:2] == (20, 4)
    assert res.potential_energy.shape == (20, 4)
    assert res.replica_ids.shape == (21, 4)
    assert np.isfinite(res.positions).all()
    # every identity row is a permutation of replicas
    for row in res.replica_ids:
        assert sorted(row.tolist()) == [0, 1, 2, 3]
    assert 0.0 <= res.mean_acceptance <= 1.0


def test_remd_energy_ordering(short_remd):
    # hotter rungs should have higher mean potential energy
    means = short_remd.potential_energy[5:].mean(axis=0)
    assert means[-1] > means[0]


def test_demux_and_replica_views(short_remd):
    res = short_remd
    demux = res.demuxed_trajectory(0)
    assert demux.shape == (20, 22, 3)
    walker = res.replica_trajectory(0)
    assert walker.shape == (20, 22, 3)


def test_fused_remd_on_tpu(alanine_system_module):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("fully-fused REMD needs a real TPU")
    system, positions, _ = alanine_system_module
    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=500,
                     exchange_frequency=50, report_interval=50, seed=5)
    remd = ReplicaExchange(system, positions, cfg, use_pallas=True,
                           minimize=False)
    res = remd.run_fused(n_steps=500)
    assert res.positions.shape == (10, 4, 22, 3)
    assert np.isfinite(res.positions).all()
    for row in res.replica_ids:
        assert sorted(row.tolist()) == [0, 1, 2, 3]


def test_fused_remd_frame_budget(alanine_system_module):
    from pmarlo_tpu.md.pallas_md import build_pallas_remd

    system, _, _ = alanine_system_module
    with pytest.raises(ValueError, match="VMEM budget"):
        build_pallas_remd(
            system, np.linspace(300, 450, 32),
            dt=0.002, friction=1.0, n_steps=1_000_000,
            exchange_frequency=100, report_interval=100,
        )


def test_biased_run_fused_wires_bias_into_kernel(alanine_system_module, monkeypatch):
    """Round-1 regression: ReplicaExchange(..., use_pallas=True,
    pallas_bias=...) followed by run_fused() must pass the bias model into
    build_pallas_remd (it used to read an attribute that was never
    assigned, silently producing UNBIASED trajectories)."""
    import jax.numpy as jnp

    from pmarlo_tpu.md import pallas_md as PM

    system, positions, _ = alanine_system_module
    R, N = 4, system.n_atoms
    bias = {"model": object(), "quads": np.zeros((2, 4), np.int32),
            "strength": 3.5}
    captured = {}

    def fake_chunk(system_, **kw):
        captured["chunk"] = kw
        return lambda x, v, seeds, temps: (x, v, jnp.zeros((R,)))

    def fake_remd(system_, ladder, **kw):
        captured["remd"] = kw
        A = kw["n_steps"] // kw["exchange_frequency"]
        F = kw["n_steps"] // kw["report_interval"]

        def run(x, v, seed):
            frames = jnp.zeros((F, 3, R, N))
            fe = jnp.zeros((F, R))
            ids = jnp.tile(jnp.arange(R, dtype=jnp.int32), (A + 1, 1))
            acc = jnp.zeros((A, R))
            return x, v, frames, fe, ids, acc

        return run

    monkeypatch.setattr(PM, "build_pallas_chunk", fake_chunk)
    monkeypatch.setattr(PM, "build_pallas_remd", fake_remd)

    cfg = RemdConfig(n_replicas=R, t_min=300, t_max=500,
                     exchange_frequency=50, report_interval=50, seed=5)
    remd = ReplicaExchange(system, positions, cfg, use_pallas=True,
                           pallas_bias=bias, minimize=False)
    assert captured["chunk"]["bias_model"] is bias["model"]
    res = remd.run_fused(n_steps=100)
    assert "bias_model" in captured["remd"], (
        "run_fused dropped the pallas_bias: build_pallas_remd was called "
        "without bias kwargs"
    )
    assert captured["remd"]["bias_model"] is bias["model"]
    assert captured["remd"]["bias_strength"] == 3.5
    assert res.frames_per_attempt == 1


def test_replica_trajectory_exact_mapping():
    """frames_per_attempt makes the frame->attempt map exact even when the
    frame count is not divisible by the attempt count (e.g. a result
    truncated mid-run or produced by multiple blocks)."""
    from pmarlo_tpu.remd.remd import RemdResult

    R, fpc = 2, 3
    # 3 attempts * 3 frames, then truncated to 7 frames: the legacy
    # n_frames // n_attempts estimate (7 // 3 = 2) would misassign frame 6
    ids = np.array([[0, 1], [1, 0], [1, 0], [0, 1]], np.int32)  # (A+1, R)
    F = 7
    pos = np.zeros((F, R, 1, 3), np.float32)
    for f in range(F):
        for r in range(R):
            pos[f, r, 0, 0] = 10 * f + r
    res = RemdResult(
        positions=pos, potential_energy=np.zeros((F, R)),
        temperatures=np.array([300.0, 400.0]), replica_ids=ids,
        acceptance_matrix=np.array([0.5]), exchange_attempts=3,
        n_steps=900, dt_ps=0.002, frames_per_attempt=fpc,
    )
    walker0 = res.replica_trajectory(0)
    # attempts: frames 0-2 -> ids[0]=[0,1] (walker0 at rung 0),
    # frames 3-5 -> ids[1]=[1,0] (rung 1), frame 6 -> ids[2]=[1,0] (rung 1)
    expected_rung = [0, 0, 0, 1, 1, 1, 1]
    for f, rr in enumerate(expected_rung):
        assert walker0[f, 0, 0] == 10 * f + rr


def test_remd_custom_force_fn(alanine_system_module):
    """force_fn override drives the replica dynamics (protein-scale REMD
    path: md.pallas_pair.build_pair_force_fn batches via the pallas vmap
    rule; here a wrapped dense fn proves the override is actually used)."""
    from pmarlo_tpu.md.integrate import make_force_fn

    system, positions, _ = alanine_system_module
    base = make_force_fn(system, None, analytic=True)
    calls = {"n": 0}

    def counting_fn(x):
        calls["n"] += 1  # counted at trace time (once per jit)
        return base(x)

    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=500,
                     exchange_frequency=50, report_interval=50, seed=3)
    remd = ReplicaExchange(system, positions, cfg, force_fn=counting_fn,
                           minimize=False)
    res = remd.run(n_steps=200)
    assert calls["n"] > 0, "custom force_fn was never traced"
    assert np.isfinite(res.positions).all()
    with pytest.raises(ValueError, match="exclusive"):
        ReplicaExchange(system, positions, cfg, force_fn=counting_fn,
                        use_pallas=True)


@pytest.mark.slow
def test_heating_and_equilibration_phases(alanine_system_module):
    system, positions, _ = alanine_system_module
    cfg = RemdConfig(
        n_replicas=4, t_min=300.0, t_max=360.0,
        exchange_frequency=50, report_interval=50, dt_ps=0.002, seed=3,
        heating_steps=100, equilibration_steps=100,
    )
    remd = ReplicaExchange(system, positions, cfg)
    result = remd.run(n_steps=200)
    # phases ran and production stats exist
    assert result.positions.shape[0] >= 1
    assert np.isfinite(result.mean_acceptance)
    # all replica temperatures remain physical after heating/equil
    T = np.asarray(result.temperatures[-1])
    assert np.all(T > 100.0) and np.all(T < 1000.0)


@pytest.mark.slow
def test_rung_energies_track_ladder(alanine_system_module):
    # equipartition: hotter rungs sample higher potential energy, and
    # rung-major recording keeps each rung at its ladder temperature
    # across swaps (velocity rescale on accepted exchanges)
    system, positions, _ = alanine_system_module
    cfg = RemdConfig(
        n_replicas=4, t_min=300.0, t_max=600.0,
        exchange_frequency=100, report_interval=100, dt_ps=0.002, seed=4,
    )
    remd = ReplicaExchange(system, positions, cfg)
    result = remd.run(n_steps=6000)
    pe = np.asarray(result.potential_energy)      # (F, R)
    mean_pe = pe[pe.shape[0] // 2:].mean(axis=0)  # discard thermalization
    ladder = np.asarray(cfg.ladder())
    assert np.corrcoef(mean_pe, ladder)[0, 1] > 0.8, (mean_pe, ladder)
    # strictly increasing end-to-end
    assert mean_pe[-1] > mean_pe[0]


def test_predicted_acceptance_formula():
    """Gaussian two-rung acceptance: exact limits — identical rungs
    accept always; hugely separated rungs never."""
    from pmarlo_tpu.remd.ladder import predicted_acceptance

    e_mean = lambda T: 100.0 * T       # linear E(T), C = 100 kJ/mol/K
    e_std = lambda T: 50.0
    assert predicted_acceptance(300.0, 300.0001, e_mean, e_std) > 0.99
    assert predicted_acceptance(300.0, 600.0, e_mean, e_std) < 1e-6
    # monotone decreasing in gap
    accs = [predicted_acceptance(300.0, 300.0 + d, e_mean, e_std)
            for d in (1.0, 3.0, 10.0, 30.0)]
    assert all(a > b for a, b in zip(accs, accs[1:]))


@pytest.mark.slow
def test_suggest_ladder_hits_target(alanine_system_module):
    """The designed ladder's predicted neighbor acceptance must sit at
    the target, and the measured acceptance of a short REMD run with
    that ladder must land in a generous band around it (the 3gd8 ~0%
    regression scenario, ROUND2_NOTES)."""
    from pmarlo_tpu.remd.ladder import suggest_temperature_ladder
    from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

    import jax.numpy as jnp

    system, x, _ = alanine_system_module
    x = jnp.asarray(x)
    ladder, predicted = suggest_temperature_ladder(
        system, x, t_min=300.0, t_max=450.0, target_acceptance=0.35,
        probe_steps=400, seed=1,
    )
    assert ladder[0] == 300.0 and ladder[-1] == 450.0
    assert np.all(np.diff(ladder) > 0)
    # every designed neighbor gap predicts ~the target (last may exceed)
    assert all(p >= 0.3 for p in predicted)
    assert all(p <= 0.9 for p in predicted[:-1]) or len(predicted) == 1

    cfg = RemdConfig(
        n_replicas=len(ladder), temperatures=tuple(float(t) for t in ladder),
        exchange_frequency=20, report_interval=20, seed=3,
    )
    remd = ReplicaExchange(system, x, cfg, minimize=False)
    res = remd.run(n_steps=800)
    acc = res.acceptance_matrix
    acc = acc[np.isfinite(acc)]
    # small-sample band: target 0.35 measured over ~40 attempts/pair
    assert 0.1 < float(np.mean(acc)) < 0.8, res.acceptance_matrix


@pytest.mark.slow
def test_run_replica_exchange_target_acceptance(tmp_path):
    """One-call REMD with an acceptance-designed ladder."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.io.pdb import write_pdb
    from pmarlo_tpu.remd.remd import run_replica_exchange

    s = alanine_dipeptide_structure()
    pdb = write_pdb(
        tmp_path / "ala.pdb", s.coordinates(),
        [a.name for r in s.residues for a in r.atoms],
        [a.resname for r in s.residues for a in r.atoms],
        [a.resid for r in s.residues for a in r.atoms],
    )
    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=420,
                     exchange_frequency=20, report_interval=20, seed=1)
    res, system = run_replica_exchange(
        pdb, n_steps=400, config=cfg, target_acceptance=0.35,
    )
    acc = res.acceptance_matrix
    acc = acc[np.isfinite(acc)]
    assert res.temperatures[0] == 300.0 and res.temperatures[-1] == 420.0
    assert 0.1 < float(np.mean(acc)) < 0.85, res.acceptance_matrix


@pytest.mark.slow
def test_run_replica_exchange_explicit_solvent(tmp_path):
    """Solvated input (CRYST1 + waters) auto-routes the one-call REMD
    facade to the explicit path: periodic force fn + rigid-water SHAKE
    in every replica (mirrors run_segment's detection)."""
    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure, write_pdb
    from pmarlo_tpu.remd.remd import run_replica_exchange

    residues, rid = [], 1
    for i in range(3):
        for j in range(3):
            for k in range(3):
                o = (0.15 + i * 0.31, 0.15 + j * 0.31, 0.15 + k * 0.31)
                mk = lambda n, x, y, z, e: PDBAtom(
                    name=n, resname="HOH", resid=rid, chain="W",
                    xyz=(x, y, z), element=e)
                residues.append(PDBResidue(
                    name="HOH", resid=rid, chain="W",
                    atoms=[mk("O", *o, "O"),
                           mk("H1", o[0] + 0.09572, o[1], o[2], "H"),
                           mk("H2", o[0] - 0.02399, o[1] + 0.09266,
                              o[2], "H")]))
                rid += 1
    s = PDBStructure(residues=residues)
    L = 3 * 0.31 + 0.1
    pdb = write_pdb(
        tmp_path / "waterbox.pdb", s.coordinates(),
        [a.name for r in s.residues for a in r.atoms],
        [a.resname for r in s.residues for a in r.atoms],
        [a.resid for r in s.residues for a in r.atoms],
        box=(L, L, L),
    )
    cfg = RemdConfig(n_replicas=2, t_min=300, t_max=360,
                     exchange_frequency=10, report_interval=10,
                     dt_ps=0.001, seed=0)
    res, system = run_replica_exchange(
        pdb, n_steps=40, config=cfg, cutoff=0.45,
    )
    assert system.box is not None
    assert np.isfinite(res.positions).all()
    assert res.positions.shape[1] == 2


@pytest.mark.slow
def test_force_fn_override_composes_bias(alanine_system_module):
    """bias_fn + force_fn override: the bias must reach BOTH the
    dynamics and the Metropolis energies — storing the override
    unmodified runs silently unbiased."""
    import jax.numpy as jnp

    from pmarlo_tpu.md.integrate import make_force_fn

    system, positions, _ = alanine_system_module
    base = make_force_fn(system, None, analytic=True)

    def huge_bias(x):
        # large positional bias so trajectories visibly diverge
        return 1e3 * jnp.sum((x[0] - 1.0) ** 2)

    cfg = RemdConfig(n_replicas=2, t_min=300, t_max=400,
                     exchange_frequency=50, report_interval=50, seed=3)
    plain = ReplicaExchange(system, positions, cfg, force_fn=base,
                            minimize=False).run(n_steps=100)
    biased = ReplicaExchange(system, positions, cfg, force_fn=base,
                             bias_fn=huge_bias, minimize=False).run(
                                 n_steps=100)
    assert not np.allclose(plain.positions[-1], biased.positions[-1],
                           atol=1e-4), "bias_fn was silently dropped"
    # composed energies include the bias term
    fn = ReplicaExchange(system, positions, cfg, force_fn=base,
                         bias_fn=huge_bias, minimize=False)._force_fn
    x = jnp.asarray(positions)
    e_base = float(base(x)[0])
    e_comp = float(fn(x)[0])
    np.testing.assert_allclose(e_comp - e_base, float(huge_bias(x)),
                               rtol=1e-5)


@pytest.mark.slow
def test_second_run_ids_history_head_is_pre_run_permutation(
    alanine_system_module,
):
    """run() #2 must report its first attempt chunk under the permutation
    run() #1 ended with, not the identity."""
    system, positions, _ = alanine_system_module
    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=900,
                     exchange_frequency=25, report_interval=25, seed=11)
    remd = ReplicaExchange(system, positions, cfg, minimize=True)
    r1 = remd.run(n_steps=500)
    final_perm = np.asarray(r1.replica_ids[-1])
    r2 = remd.run(n_steps=100)
    np.testing.assert_array_equal(np.asarray(r2.replica_ids[0]), final_perm)


def test_suggest_ladder_raises_on_max_rungs_truncation(
    alanine_system_module,
):
    """A ladder that cannot span [t_min, t_max] within max_rungs must
    raise, not silently return one that never samples near t_max."""
    import jax.numpy as jnp

    from pmarlo_tpu.remd.ladder import suggest_temperature_ladder

    system, x, _ = alanine_system_module
    with pytest.raises(ValueError, match="max_rungs"):
        suggest_temperature_ladder(
            system, jnp.asarray(x), t_min=300.0, t_max=500.0,
            # an extreme target forces tiny rung gaps
            target_acceptance=0.99, max_rungs=4,
            probe_steps=200, seed=1,
        )


def test_frame_precision_i16_matches_f32(alanine_system_module):
    """i16 frame transfer: identical dynamics (state stays f32 — only
    the SHIPPED frames quantize), positions within the 5e-4 nm
    rounding bound, half the frame bytes, config validation."""
    system, positions, _ = alanine_system_module
    import jax

    runs = {}
    for prec in ("f32", "i16"):
        cfg = RemdConfig(
            n_replicas=4, t_min=300, t_max=600, exchange_frequency=50,
            report_interval=50, seed=7, frame_precision=prec,
        )
        remd = ReplicaExchange(system, positions, cfg, minimize=False,
                               use_pallas=False)
        runs[prec] = remd.run(n_steps=200)
    a, b = runs["f32"], runs["i16"]
    assert b.positions.dtype == np.float32
    # same trajectory to quantization resolution
    np.testing.assert_allclose(a.positions, b.positions, atol=5.1e-4)
    assert not np.array_equal(a.positions, b.positions)  # really quantized
    np.testing.assert_array_equal(a.replica_ids, b.replica_ids)
    np.testing.assert_allclose(a.potential_energy, b.potential_energy,
                               rtol=1e-6)
    with pytest.raises(ValueError, match="frame_precision"):
        RemdConfig(frame_precision="bf16")
