"""Benchmark harness: 32-replica alanine-dipeptide REMD throughput on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric: aggregate REMD sampling throughput (ns/day summed over the 32
replicas, the driver's BASELINE.json workload) measured steady-state
(compile excluded by timing a second identical run). A secondary MSM-build
wall-clock over 35 shards / ~13k frames (the reference's largest exercised
analysis workload, README.md:125-126) is included in the JSON.

Baseline denominator: the reference publishes no throughput numbers
(BASELINE.json "published": {}) and OpenMM is not installed in this image,
so the denominator cannot be measured here. 864 ns/day aggregate (27
ns/day/replica, ~15.6k steps/s single-replica CPU) is a documented
estimate for a workstation CPU; ``benchmark_openmm_baseline.py`` at the
repo root reproduces the reference's exact MD configuration and prints a
measured replacement for any environment that has OpenMM — the JSON below
carries ``baseline_provenance`` so consumers know which kind they got.
"""

from __future__ import annotations

import json
import time

import numpy as np

OPENMM_CPU_BASELINE_NS_PER_DAY = 864.0  # documented estimate, see docstring

N_REPLICAS = 32
N_STEPS = 20_000            # per timed run (200 exchange attempts)
DT_PS = 0.002
EXCHANGE_FREQUENCY = 100
#: headline rows carry {median, iqr, n} over this many repeats (VERDICT
#: r4 item 2: single-shot numbers made tunnel noise indistinguishable
#: from regressions)
N_REPEATS = 3


def _med_iqr(vals) -> "tuple[float, float]":
    v = np.asarray(list(vals), np.float64)
    return (float(np.median(v)),
            float(np.percentile(v, 75) - np.percentile(v, 25)))


def bench_remd() -> dict:
    import jax

    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

    # gbn2: the reference's solvent model (simulation/__init__.py:64-71)
    system, positions = build_system(
        alanine_dipeptide_structure(), gb_model="gbn2"
    )
    cfg = RemdConfig(
        n_replicas=N_REPLICAS, t_min=300.0, t_max=450.0,
        exchange_frequency=EXCHANGE_FREQUENCY,
        report_interval=EXCHANGE_FREQUENCY, dt_ps=DT_PS, seed=0,
        # one scan block per timed run: the tunneled device pays ~100 ms per
        # dispatch, so the steady-state number measures the device, not RPC
        attempts_per_block=N_STEPS // EXCHANGE_FREQUENCY,
    )
    # fused Pallas kernel path (1.8x over XLA); fall back if the platform
    # cannot lower it (e.g. CPU test runs)
    try:
        remd = ReplicaExchange(system, positions, cfg, use_pallas=True)
        remd.run(n_steps=N_STEPS)  # warm-up compile
        md_path = "pallas"
    except Exception:
        remd = ReplicaExchange(system, positions, cfg)
        remd.run(n_steps=N_STEPS)
        md_path = "xla"
    # timed steady-state runs (same shapes -> cached executable)
    walls = []
    result = None
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        result = remd.run(n_steps=N_STEPS)
        walls.append(time.perf_counter() - t0)
    wall, wall_iqr = _med_iqr(walls)

    sim_ns_per_replica = N_STEPS * DT_PS * 1e-3
    aggregate_ns_day = sim_ns_per_replica * N_REPLICAS * 86_400.0 / wall
    out = {
        "ns_per_day_aggregate": aggregate_ns_day,
        "ns_per_day_per_replica": aggregate_ns_day / N_REPLICAS,
        "steps_per_second": N_STEPS * N_REPLICAS / wall,
        "remd_wall_s": wall,
        "remd_wall_iqr_s": wall_iqr,
        "remd_repeats": N_REPEATS,
        "mean_swap_acceptance": float(result.mean_acceptance),
        "md_path": md_path,
        "gb_model": "gbn2",
    }
    # XTC-precision (int16 fixed-point, 1e-3 nm) frame transfer: halves
    # the device->host bytes, which bound the wall on tunneled hosts.
    # The headline stays the exact-f32 row.
    try:
        import dataclasses as _dc

        remd16 = ReplicaExchange(
            system, positions,
            _dc.replace(cfg, frame_precision="i16"),
            use_pallas=(md_path == "pallas"),
        )
        remd16.run(n_steps=N_STEPS)  # warm-up compile
        walls16 = []
        for _ in range(N_REPEATS):
            t0 = time.perf_counter()
            remd16.run(n_steps=N_STEPS)
            walls16.append(time.perf_counter() - t0)
        w16, _ = _med_iqr(walls16)
        out["remd_wall_i16_s"] = w16
        out["ns_per_day_per_replica_i16"] = (
            sim_ns_per_replica * 86_400.0 / w16
        )
    except Exception:  # pragma: no cover - optional row
        pass
    # wall decomposition (VERDICT r4 item 2): the r3->r4 "regression"
    # needed attribution. Measured r5: the DEVICE path is 2x faster than
    # the r3 headline while the axon tunnel moves frames at ~10 MB/s —
    # the wall row is transfer-bound, not a kernel regression. These
    # rows make the split visible every round.
    try:
        import jax.numpy as jnp

        n_attempts = N_STEPS // EXCHANGE_FREQUENCY
        blk = remd._jit_cache[("run", n_attempts, 1)]
        st, ids, key = remd.state, remd.replica_ids, remd._swap_key
        zero = jnp.asarray(0, jnp.int32)
        _, dev_out = blk(st, ids, key, zero)
        jax.block_until_ready(dev_out)
        devs, trs = [], []
        for _ in range(N_REPEATS):
            t0 = time.perf_counter()
            _, dev_out = blk(st, ids, key, zero)
            jax.block_until_ready(dev_out)
            devs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            host = jax.tree_util.tree_map(np.asarray, dev_out)
            trs.append(time.perf_counter() - t0)
        dev, _ = _med_iqr(devs)
        tr, _ = _med_iqr(trs)
        nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(host))
        out["remd_device_block_s"] = dev
        out["remd_transfer_s"] = tr
        out["remd_tunnel_mb_s"] = nbytes / 1e6 / tr
        out["ns_per_day_per_replica_device_only"] = (
            sim_ns_per_replica * 86_400.0 / dev
        )
    except Exception:  # pragma: no cover - decomposition is best-effort
        pass
    return out


def bench_msm() -> dict:
    """MSM/FES rebuild over 35 shards / ~13k frames (reference workload)."""
    from pmarlo_tpu.analysis.discretize import discretize_dataset
    from pmarlo_tpu.msm.free_energy import generate_2d_fes

    rng = np.random.default_rng(0)
    shards = []
    frames_per_shard = 13_000 // 35
    for _ in range(35):
        X = np.concatenate([
            rng.normal(-1, 0.3, (frames_per_shard // 2, 4)),
            rng.normal(1, 0.3, (frames_per_shard - frames_per_shard // 2, 4)),
        ]).astype(np.float32)
        rng.shuffle(X)
        shards.append({"features": X, "metadata": {"stride": 1}})
    def build():
        result = discretize_dataset(shards, n_states=50, lag=10, seed=0)
        pooled = np.concatenate([s["features"] for s in shards])
        generate_2d_fes(pooled[:, 0], pooled[:, 1], temperature_K=300.0, bins=32)
        return result, pooled

    # cold = first build (kmeans/counting compiles included); warm =
    # steady-state rebuilds on cached executables (VERDICT r4 item 9:
    # the two regimes must be separate rows, and warm is the one that
    # matters for iterative analysis)
    t0 = time.perf_counter()
    build()
    cold = time.perf_counter() - t0
    walls = []
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        result, pooled = build()
        walls.append(time.perf_counter() - t0)
    warm, warm_iqr = _med_iqr(walls)
    return {
        "msm_build_wall_s": warm,       # steady-state (back-compat key)
        "msm_build_warm_s": warm,
        "msm_build_warm_iqr_s": warm_iqr,
        "msm_build_cold_s": cold,
        "msm_repeats": N_REPEATS,
        "msm_n_frames": int(pooled.shape[0]),
        "msm_n_shards": 35,
        "msm_counted_pairs": result.counted_pairs,
    }


def bench_max_replicas() -> dict:
    """Chip-saturation probe: 256-replica fused chunks (no swaps) — the
    aggregate-throughput ceiling on one chip."""
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.pallas_md import build_pallas_chunk
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    system, pos = build_system(topo, gb_model="gbn2")
    R = 256
    try:
        chunk = build_pallas_chunk(system, dt=DT_PS, friction=1.0,
                                   n_steps=1000, n_replicas=R)
        x = jnp.broadcast_to(pos[None], (R, system.n_atoms, 3)).astype(jnp.float32)
        v = jnp.zeros_like(x)
        seeds = jnp.arange(R, dtype=jnp.int32)
        temps = jnp.linspace(300.0, 500.0, R, dtype=jnp.float32)
        xo, vo, eo = chunk(x, v, seeds, temps)
        jax.block_until_ready(xo)
        t0 = time.perf_counter()
        for _ in range(5):
            xo, vo, eo = chunk(xo, vo, seeds, temps)
        jax.block_until_ready(xo)
        wall = (time.perf_counter() - t0) / 5
        return {
            "max_aggregate_replicas": R,
            "max_aggregate_ns_per_day": R * 1000 * DT_PS * 1e-3 / wall * 86_400.0,
        }
    except Exception:
        return {}


def bench_protein() -> dict:
    """3gd8 (3,350 atoms) MD via the tiled pair kernel — the protein-scale
    throughput story (skipped when the reference asset isn't mounted)."""
    import os

    pdb = "/root/reference/tests/_assets/3gd8.pdb"
    if not os.path.exists(pdb):
        return {}
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.md.integrate import langevin_step, thermalize
    from pmarlo_tpu.md.minimize import minimize_energy
    from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(pdb, ph=7.0).prepare()
    system, x0 = p.create_system()
    fn = build_pair_force_fn(system, tile=256)
    xmin, _ = minimize_energy(system, x0)
    st = thermalize(system, xmin, jax.random.PRNGKey(0), 300.0)

    def body(s, _):
        s2, e = langevin_step(system, s, dt=0.002, friction=1.0,
                              temperature_K=300.0, force_fn=fn)
        return s2, e

    @jax.jit
    def run500(s):
        return jax.lax.scan(body, s, None, length=500)

    out = run500(st)
    jax.block_until_ready(out[0].positions)  # compile
    walls = []
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        out = run500(out[0])
        jax.block_until_ready(out[0].positions)
        walls.append(time.perf_counter() - t0)
    wall, wall_iqr = _med_iqr(walls)
    return {
        "protein_n_atoms": system.n_atoms,
        "protein_ns_per_day": 500 * DT_PS * 1e-3 / wall * 86_400.0,
        "protein_ms_per_step": wall / 500 * 1e3,
        "protein_ms_per_step_iqr": wall_iqr / 500 * 1e3,
    }


def bench_explicit() -> dict:
    """Solvated chignolin (TIP3P + ions, reaction field, rigid water,
    2 fs) via the periodic Pallas kernel + roll-layout SHAKE — the
    explicit-solvent story (beyond the reference's implicit-only MD)."""
    import os

    pdb = "/root/reference/data/chignolin.pdb"
    if not os.path.exists(pdb):
        return {}
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.md.constraints import build_h_constraints
    from pmarlo_tpu.md.integrate import langevin_step, thermalize
    from pmarlo_tpu.md.minimize import minimize_energy
    from pmarlo_tpu.md.pallas_periodic import build_periodic_force_fn
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(pdb, ph=7.0).prepare(solvate=True, solvent_padding=0.8)
    system, x0 = p.create_system(explicit_solvent=True, cutoff=0.9)
    xmin, _ = minimize_energy(system, jnp.asarray(x0), max_iterations=50)
    st = thermalize(system, xmin, jax.random.PRNGKey(0), 300.0)
    spec = build_h_constraints(system)
    from pmarlo_tpu.md.constraints import strip_constrained_bonded

    fn = build_periodic_force_fn(strip_constrained_bonded(system),
                                 tile=256)

    def body(s, _):
        s2, e = langevin_step(system, s, dt=DT_PS, friction=1.0,
                              temperature_K=300.0, constraints=spec,
                              force_fn=fn)
        return s2, e

    @jax.jit
    def run500(s):
        return jax.lax.scan(body, s, None, length=500)

    out = run500(st)
    jax.block_until_ready(out[0].positions)
    walls = []
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        out = run500(out[0])
        jax.block_until_ready(out[0].positions)
        walls.append(time.perf_counter() - t0)
    wall, wall_iqr = _med_iqr(walls)
    return {
        "explicit_n_atoms": system.n_atoms,
        "explicit_ns_per_day": 500 * DT_PS * 1e-3 / wall * 86_400.0,
        "explicit_ms_per_step": wall / 500 * 1e3,
        "explicit_ms_per_step_iqr": wall_iqr / 500 * 1e3,
    }


def bench_cells_25k(shared: dict | None = None) -> dict:
    """>= 25k-atom solvated water box through the O(N) cell-list kernel
    (md/pallas_cells.py) with rigid-water SHAKE at 2 fs — the workload
    the dense sweep cannot take on (VERDICT r2 item #1). Reports
    ms/step, ns/day, achieved TFLOP/s, the PME force-eval cost, and the
    speedup vs the dense kernel's quadratic extrapolation from its
    measured 2,315-atom cost."""
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
    from pmarlo_tpu.md.constraints import (
        build_h_constraints,
        strip_constrained_bonded,
    )
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    n_side, spacing = 21, 0.31
    residues, rid = [], 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                ox = 0.15 + i * spacing
                oy = 0.15 + j * spacing
                oz = 0.15 + k * spacing
                mk = lambda n_, x_, y_, z_, e_: PDBAtom(
                    name=n_, resname="HOH", resid=rid, chain="W",
                    xyz=(x_, y_, z_), element=e_)
                residues.append(PDBResidue(name="HOH", resid=rid, chain="W",
                                atoms=[mk("O", ox, oy, oz, "O"),
                                       mk("H1", ox + 0.09572, oy, oz, "H"),
                                       mk("H2", ox - 0.02399, oy + 0.09266,
                                          oz, "H")]))
                rid += 1
    L = n_side * spacing + 0.1
    s = PDBStructure(residues=residues)
    try:
        system, x0 = build_system(s, box=(L, L, L), cutoff=0.9,
                                  hydrogen_mass=None)
        spec = build_h_constraints(system)
        # MD force path: constrained bonded terms stripped (OpenMM
        # createSystem semantics) + skin-amortized binning via run_md
        md_system = strip_constrained_bonded(system)
        fn = build_cell_force_fn(md_system)
        st = thermalize(system, jnp.asarray(x0, jnp.float32),
                        jax.random.PRNGKey(0), 300.0)

        out, _ = run_md(system, st, n_steps=100, dt=DT_PS, friction=1.0,
                        temperature_K=300.0, report_interval=100,
                        force_fn=fn, constraints=spec)
        jax.block_until_ready(out.positions)
        walls = []
        for _ in range(N_REPEATS):
            t0 = time.perf_counter()
            out, _ = run_md(system, out, n_steps=100, dt=DT_PS,
                            friction=1.0, temperature_K=300.0,
                            report_interval=100, force_fn=fn,
                            constraints=spec)
            jax.block_until_ready(out.positions)
            walls.append(time.perf_counter() - t0)
        wall, wall_iqr = _med_iqr(walls)
        ms_step = wall / 100 * 1e3

        # full smooth-PME MD step (electrostatics upgrade path): same
        # rigid-water + skin-amortized protocol, erfc real space in the
        # kernel + reciprocal mesh via jax.grad of the spread energy
        fn_pme = build_cell_force_fn(md_system, electrostatics="pme")
        if shared is not None:
            shared.update(system=system, md_system=md_system,
                          constraints=spec, state=st, fn_rf=fn,
                          fn_pme=fn_pme)
        out_p, _ = run_md(system, st, n_steps=100, dt=DT_PS, friction=1.0,
                          temperature_K=300.0, report_interval=100,
                          force_fn=fn_pme, constraints=spec)
        jax.block_until_ready(out_p.positions)
        pwalls = []
        for _ in range(N_REPEATS):
            t0 = time.perf_counter()
            out_p, _ = run_md(system, out_p, n_steps=100, dt=DT_PS,
                              friction=1.0, temperature_K=300.0,
                              report_interval=100, force_fn=fn_pme,
                              constraints=spec)
            jax.block_until_ready(out_p.positions)
            pwalls.append(time.perf_counter() - t0)
        pme_wall, pme_iqr = _med_iqr(pwalls)
        pme_ms = pme_wall / 100 * 1e3

        # analytic kernel work: S slots x 27M candidates x ~48 flops
        g = fn.grid
        S = g.n_slots
        flops = S * 27 * g.capacity * 48
        # dense-kernel cost extrapolated quadratically from its measured
        # 2,315-atom point (BENCH_r02: 1.182 ms/step)
        dense_ms = 1.182 * (system.n_atoms / 2315.0) ** 2
        return {
            "cells_n_atoms": system.n_atoms,
            "cells_ms_per_step": ms_step,
            "cells_ms_per_step_iqr": wall_iqr / 100 * 1e3,
            "cells_repeats": N_REPEATS,
            "cells_ns_per_day": DT_PS * 1e-3 / (ms_step * 1e-3) * 86_400.0,
            "cells_tflops_achieved": flops / (ms_step * 1e-3) / 1e12,
            "cells_pme_ms_per_step": pme_ms,
            "cells_pme_ms_per_step_iqr": pme_iqr / 100 * 1e3,
            "cells_pme_ns_per_day": DT_PS * 1e-3 / (pme_ms * 1e-3) * 86_400.0,
            "cells_vs_dense_extrapolated": dense_ms / ms_step,
            "cells_grid": [g.nx, g.ny, g.nz, g.capacity],
        }
    except Exception as exc:  # pragma: no cover - bench resilience
        return {"cells_error": str(exc)[:200]}


def bench_dodecahedron() -> dict:
    """Rhombic-dodecahedron vs rotation-safe CUBIC solvation of
    chignolin at EQUAL image distance (round-3 triclinic cells,
    md/box.py): both cells keep the tumbling solute >= 2*padding from
    its images in every orientation, but the dodecahedron does it with
    ~29% less water — which shows up directly as ns/day through the
    same cell-list kernel + SHAKE protocol."""
    import os

    pdb = "/root/reference/data/chignolin.pdb"
    if not os.path.exists(pdb):
        return {}
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.md.constraints import (
        build_h_constraints,
        strip_constrained_bonded,
    )
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn
    from pmarlo_tpu.protein.protein import Protein

    try:
        out: dict = {}
        rates = {}
        for shape in ("cubic", "dodecahedron"):
            p = Protein(pdb, ph=7.0).prepare(
                solvate=True, solvent_padding=1.0, box_shape=shape,
            )
            system, x0 = p.create_system(explicit_solvent=True, cutoff=0.9)
            spec = build_h_constraints(system)
            fn = build_cell_force_fn(strip_constrained_bonded(system))
            st = thermalize(system, jnp.asarray(x0, jnp.float32),
                            jax.random.PRNGKey(0), 300.0)
            run, _ = run_md(system, st, n_steps=100, dt=DT_PS, friction=1.0,
                            temperature_K=300.0, report_interval=100,
                            force_fn=fn, constraints=spec)
            jax.block_until_ready(run.positions)
            t0 = time.perf_counter()
            run, _ = run_md(system, run, n_steps=100, dt=DT_PS,
                            friction=1.0, temperature_K=300.0,
                            report_interval=100, force_fn=fn,
                            constraints=spec)
            jax.block_until_ready(run.positions)
            wall = time.perf_counter() - t0
            key = "cube" if shape == "cubic" else "dodec"
            rates[key] = DT_PS * 1e-3 / (wall / 100) * 86_400.0
            out[f"{key}_n_atoms"] = system.n_atoms
            out[f"{key}_ns_per_day"] = rates[key]
        out["dodec_speedup_vs_cube"] = rates["dodec"] / rates["cube"]
        return out
    except Exception as exc:  # pragma: no cover - bench resilience
        return {"dodec_error": str(exc)[:200]}


def bench_npt_and_nve(shared: dict) -> dict:
    """NPT step cost + NVE energy-conservation accounting on the 27k
    TIP3P box built by bench_cells_25k (round-3 barostat + the
    conservation guardrail: hand-written kernel forces must be the
    exact gradient of the kernel energy or drift shows up here)."""
    if "system" not in shared:
        return {}
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
    from pmarlo_tpu.md.barostat import run_npt
    from pmarlo_tpu.md.integrate import kinetic_energy
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    out = {}
    system = shared["system"]
    md_system = shared["md_system"]
    spec = shared["constraints"]
    st0 = shared["state"]
    try:
        fn = build_cell_force_fn(md_system, electrostatics="pme",
                                 dispersion_correction=True)
        final, bstate, frames = run_npt(
            md_system, st0, n_steps=200, dt=DT_PS, friction=1.0,
            temperature_K=300.0, pressure_bar=1.0, barostat_interval=25,
            report_interval=100, force_fn=fn, constraints=spec,
            full_system=system,
        )
        jax.block_until_ready(final.positions)
        t0 = time.perf_counter()
        # continuation: pass the warm-up's barostat state so the timed
        # run keeps the evolved box + tuned proposal width (a fresh
        # init would pair scaled positions with the original box)
        final, bstate, frames = run_npt(
            md_system, final, n_steps=200, dt=DT_PS, friction=1.0,
            temperature_K=300.0, pressure_bar=1.0, barostat_interval=25,
            report_interval=100, force_fn=fn, constraints=spec,
            full_system=system, barostat_state=bstate,
        )
        jax.block_until_ready(final.positions)
        out["npt_ms_per_step"] = (time.perf_counter() - t0) / 200 * 1e3
        out["npt_density_g_cm3"] = float(frames["density_g_cm3"][-1])
    except Exception as exc:  # pragma: no cover - bench resilience
        out["npt_error"] = str(exc)[:200]

    # NVE drift: friction = 0 turns BAOAB into velocity Verlet; report
    # d(E_tot)/dt per dof in kT/ns for the RF and PME engines (scan
    # programs via run_md — eager per-step dispatch would be RPC-bound
    # on the tunneled device)
    try:
        from pmarlo_tpu.md.constraints import n_constraints as _nc
        from pmarlo_tpu.md.integrate import run_md

        n_dof = 3 * system.n_atoms - 3 - _nc(spec)
        kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * 300.0
        # drift = SLOPE of a linear fit over checkpoints, not a
        # two-point difference: E_tot carries bounded O(dt^2) shadow
        # oscillations whose start/end sampling noise (~0.5 kT/dof/ns
        # over a 4 ps window) would swamp the real secular drift this
        # row exists to catch
        n_seg, seg = 12, 500
        from pmarlo_tpu.md.pallas_cells import build_cell_force_fn as _bld

        fns = {
            "rf": shared["fn_rf"],
            "pme": shared["fn_pme"],
            # the compensated-df32 reciprocal path (md/pme.py
            # spread_charges_precise): the knob that closes the round-3
            # f32-noise drift floor (VERDICT r3 item #2) — measure both
            # the drift AND its step cost next to plain pme
            "pme_precise": _bld(md_system, electrostatics="pme",
                                pme_precise=True),
        }
        for elec, fn in fns.items():
            st, _ = run_md(system, st0, n_steps=100, dt=DT_PS,
                           friction=1.0, temperature_K=300.0,
                           report_interval=100, force_fn=fn,
                           constraints=spec)
            if elec == "pme_precise":
                # step cost next to the plain-pme row (the VERDICT bar:
                # drift <= 0.2 at <= 20% extra step cost)
                jax.block_until_ready(st.positions)
                tq = time.perf_counter()
                st, _ = run_md(system, st, n_steps=100, dt=DT_PS,
                               friction=1.0, temperature_K=300.0,
                               report_interval=100, force_fn=fn,
                               constraints=spec)
                jax.block_until_ready(st.positions)
                out["cells_pme_precise_ms_per_step"] = (
                    (time.perf_counter() - tq) / 100 * 1e3
                )

            def etot(s):
                e, _f = fn(s.positions)
                return float(e) + float(kinetic_energy(
                    system, s.velocities))

            es = [etot(st)]
            for _ in range(n_seg):
                st, _ = run_md(system, st, n_steps=seg, dt=DT_PS,
                               friction=0.0, temperature_K=300.0,
                               report_interval=seg, force_fn=fn,
                               constraints=spec)
                es.append(etot(st))
            t_ns = np.arange(n_seg + 1) * seg * DT_PS * 1e-3
            slope = float(np.polyfit(t_ns, np.asarray(es), 1)[0])
            out[f"nve_drift_kT_per_dof_per_ns_{elec}"] = (
                slope / kT / n_dof
            )
    except Exception as exc:  # pragma: no cover - bench resilience
        out["nve_error"] = str(exc)[:200]
    return out


def bench_protein_remd_production() -> dict:
    """PRODUCTION-SPAN protein REMD, end-to-end and STATISTICALLY REAL
    (VERDICT r4 item #1 — the round-4 run's 64 counted pairs could not
    support ITS/CK conclusions).

    3gd8 (3,350 atoms, GBn2 implicit solvent via the tiled pair kernel):
    ``suggest_temperature_ladder`` designs a 300-375 K ladder at the
    ACTUAL target acceptance 0.3 (the autocorrelation-aware sigma_E
    makes the prediction trustworthy — no design-target fudge), then a
    500-exchange-attempt production run records per-rung acceptance +
    aggregate ns/day. The demuxed four coldest rungs flow through the
    flagship pipeline (phi/psi -> shard store -> MSM) and the
    framework's OWN quality gates run on the result: ITS plateau and
    the ESS-adjusted CK rule (validation contract, reference
    ck_rule.py:69-117), recorded as bench rows.

    Runs the standard 4 fs implicit production protocol: SHAKE/RATTLE
    on every X-H bond (constraints="hbonds") + the default HMR 3 amu
    (Amber SHAKE+HMR; the reference runs 2 fs with OpenMM HBonds)."""
    import os
    import tempfile

    pdb = "/root/reference/tests/_assets/3gd8.pdb"
    if not os.path.exists(pdb):
        return {}
    try:
        import jax.numpy as jnp

        from pmarlo_tpu.analysis.discretize import discretize_dataset
        from pmarlo_tpu.features.base import TopologyInfo
        from pmarlo_tpu.features.featurize import featurize_trajectory
        from pmarlo_tpu.io.shards import (
            emit_shards_from_trajectory,
            read_shard,
            select_shard_paths,
        )
        from pmarlo_tpu.md.minimize import minimize_energy
        from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
        from pmarlo_tpu.msm.ck import CKConfig, ck_test, decide_ck
        from pmarlo_tpu.msm.its import compute_implied_timescales
        from pmarlo_tpu.protein.protein import Protein
        from pmarlo_tpu.remd.ladder import suggest_temperature_ladder
        from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

        from pmarlo_tpu.md.constraints import (
            build_h_constraints,
            strip_constrained_bonded,
        )

        p = Protein(pdb, ph=7.0).prepare()
        system, x0 = p.create_system()
        fn = build_pair_force_fn(system, tile=256)
        xmin, _ = minimize_energy(system, jnp.asarray(x0), force_fn=fn)
        # 4 fs protocol: MD forces from the stripped system (constrained
        # X-H bond terms removed, createSystem semantics); minimization
        # above used the FULL system
        dt = 0.004
        hspec = build_h_constraints(system)
        fn_md = build_pair_force_fn(strip_constrained_bonded(system),
                                    tile=256)
        # target 0.32: the min-PAIR acceptance bar is >= 0.2 and the
        # worst pair of a 0.30-target run measured 0.196 (an order
        # statistic over 11 pairs x ~250 attempts fluctuates ~0.03);
        # the slightly hotter target buys margin at negligible rung cost
        ladder, predicted = suggest_temperature_ladder(
            system, xmin, t_min=300.0, t_max=375.0,
            target_acceptance=0.32, probe_steps=600, n_probe=6,
            force_fn=fn_md, constraints=hspec, max_rungs=48, dt_ps=dt,
        )
        R = len(ladder)
        n_attempts = 500
        cfg = RemdConfig(
            n_replicas=R,
            temperatures=tuple(float(t) for t in ladder),
            exchange_frequency=100, report_interval=50, dt_ps=dt,
            # 5-attempt blocks (~15 s device programs at 12 rungs):
            # 25-attempt blocks (~73 s single programs) repeatedly took
            # the tunneled TPU worker down mid-run; the 5-attempt
            # granularity is the one measured stable over 500 attempts
            # (scripts/remd_flagship_stages.py)
            seed=0, attempts_per_block=5,
        )
        remd = ReplicaExchange(system, xmin, cfg, force_fn=fn_md,
                               constraints=hspec, minimize=False)
        # warm-up block: compiles the 25-attempt executable AND serves as
        # the equilibration phase (the timed run reuses the executable)
        remd.run(n_steps=2500)
        # production in host-synced 25-attempt slices: one run() call per
        # scan block, demux + transfer per slice (~24 MB). A single
        # run(n_steps=50000) queued ~25 min of device work and gathered
        # ~0.5 GB in one blocking RPC, which exceeded the axon tunnel's
        # deadline and took the TPU worker down (twice) — the sliced
        # pattern is measured stable over the full 500 attempts
        # (scripts/remd_flagship_stages.py).
        n_steps = n_attempts * 100
        slice_attempts = 25
        demux_frames = {r: [] for r in (0, 1, 2, 3)}
        acc_slices = []
        t0 = time.perf_counter()
        done_attempts = 0
        while done_attempts < n_attempts:
            n_a = min(slice_attempts, n_attempts - done_attempts)
            res = remd.run(n_steps=n_a * 100)
            for rung in demux_frames:
                demux_frames[rung].append(res.demuxed_trajectory(rung))
            acc_slices.append(res.acceptance_matrix)
            done_attempts += n_a
        wall = time.perf_counter() - t0
        # per-pair acceptance averaged over equal-attempt slices
        acc_mat = np.asarray(acc_slices)
        with np.errstate(invalid="ignore"):
            acc = np.nanmean(acc_mat, axis=0)
        finite = acc[np.isfinite(acc)]

        # flagship pipeline on the FOUR coldest rungs: demux (rung-major
        # by construction) -> phi/psi -> shards -> MSM + quality gates
        info = TopologyInfo.from_topology(p.topology)
        t_pipe = time.perf_counter()
        with tempfile.TemporaryDirectory() as td:
            for rung in demux_frames:
                X, _ = featurize_trajectory(
                    np.concatenate(demux_frames[rung], axis=0),
                    "phi_psi", info, cos_sin_expand=True,
                )
                emit_shards_from_trajectory(
                    td, np.asarray(X),
                    temperature_K=float(res.temperatures[rung]),
                    run_id="bench", frames_per_shard=250, dt_ps=dt,
                    feature_spec=["phi_psi"],
                )
            shards = [read_shard(q) for q in select_shard_paths(td)]
            msm = discretize_dataset(shards, n_states=8, lag=2, seed=0)
        pipe_wall = time.perf_counter() - t_pipe

        # quality gates on the flagship's own data (VERDICT r4 item 1)
        its = compute_implied_timescales(
            msm.dtrajs, lags=[1, 2, 3, 5, 8, 12, 20], n_samples=32,
            seed=0,
        )
        ck = ck_test(msm.dtrajs, lag=2, factors=(2, 3))
        decision = decide_ck(ck, CKConfig(mode="ess_adjusted"))

        agg = n_steps * dt * 1e-3 * R * 86_400.0 / wall
        mean_acc = float(finite.mean()) if finite.size else 0.0
        pred_mean = float(np.mean(predicted))
        return {
            "protein_remd_rungs": R,
            "protein_remd_dt_fs": dt * 1e3,
            "protein_remd_t_span": [float(ladder[0]), float(ladder[-1])],
            "protein_remd_predicted_acceptance": pred_mean,
            "protein_remd_measured_acceptance": mean_acc,
            "protein_remd_acceptance_abs_err": abs(pred_mean - mean_acc),
            "protein_remd_min_pair_acceptance": (
                float(finite.min()) if finite.size else 0.0
            ),
            "protein_remd_acceptance_in_band": bool(
                finite.size and 0.1 <= mean_acc <= 0.7
            ),
            "protein_remd_aggregate_ns_per_day": agg,
            "protein_remd_wall_s": wall,
            "protein_remd_exchange_attempts": int(done_attempts),
            "protein_remd_msm_states": int(msm.transition_matrix.shape[0]),
            "protein_remd_counted_pairs": int(msm.counted_pairs),
            "protein_remd_pipeline_wall_s": pipe_wall,
            "protein_remd_its_plateau_lag": (
                -1 if its.plateau_lag is None else int(its.plateau_lag)
            ),
            "protein_remd_ck_pass": bool(decision["passed"]),
            "protein_remd_ck_detail": {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in decision.get("per_factor", {}).items()
            },
        }
    except Exception as exc:  # pragma: no cover - bench resilience
        return {"protein_remd_error": str(exc)[:300]}


def bench_gb_culled() -> dict:
    """Tile-culled implicit-solvent GB at protein-assembly scale
    (VERDICT r3 item #3: the dense pair kernel was O(N^2) with no
    escape). 3gd8 assemblies (2x2x2 = 26,800 and 3x3x2 = 60,300 atoms,
    GBn2) through pallas_pair's gb_cutoff path: Morton-ordered tiles,
    per-evaluation AABB tile-neighbor lists, dynamic per-row loop
    bounds. Dense anchor: 119.14 ms/force MEASURED round 4 at 26,800
    atoms (tile=128; tile=256 fails to compile there and at 60,300 the
    dense kernel exceeds VMEM outright — ROUND4_NOTES) -> the 60k
    denominator is that anchor extrapolated quadratically, because no
    dense kernel RUNS at 60k."""
    import os

    pdb = "/root/reference/tests/_assets/3gd8.pdb"
    if not os.path.exists(pdb):
        return {}
    try:
        import jax
        import jax.numpy as jnp

        from pmarlo_tpu.data import replicate_structure
        from pmarlo_tpu.md.forcefield import build_system
        from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
        from pmarlo_tpu.protein.protein import Protein

        DENSE_ANCHOR_MS = 119.14   # measured this round at 26,800 atoms
        DENSE_ANCHOR_N = 26_800
        p = Protein(pdb, ph=7.0).prepare()
        out: dict = {}
        for nrep, label in (((2, 2, 2), "27k"), ((3, 3, 2), "60k")):
            big = replicate_structure(p.structure, n=nrep, gap=0.6)
            system, x0 = build_system(big, gb_model="gbn2")
            x = jnp.asarray(np.asarray(x0), jnp.float32)
            fn = build_pair_force_fn(system, tile=128, gb_cutoff=1.5,
                                     order_from=np.asarray(x0))
            e, f = fn(x)
            jax.block_until_ready(f)
            t0 = time.perf_counter()
            for _ in range(10):
                e, f = fn(x)
            jax.block_until_ready(f)
            ms = (time.perf_counter() - t0) / 10 * 1e3
            if label == "60k":
                # MD-STEP row at 60k (VERDICT r4 item 7): the 4 fs
                # implicit production protocol through the culled kernel
                from pmarlo_tpu.md.constraints import (
                    build_h_constraints,
                    strip_constrained_bonded,
                )
                from pmarlo_tpu.md.integrate import run_md, thermalize
                from pmarlo_tpu.md.minimize import minimize_energy

                hspec = build_h_constraints(system)
                fn_md = build_pair_force_fn(
                    strip_constrained_bonded(system), tile=128,
                    gb_cutoff=1.5, order_from=np.asarray(x0),
                )
                # minimize before dynamics: raw replicate clashes
                # explode the step and trip the tile-list overflow
                # guard (loud by design since advisor r4)
                x, _ = minimize_energy(system, x, force_fn=fn,
                                       max_iterations=300)
                st = thermalize(system, x, jax.random.PRNGKey(0), 300.0)
                st, _ = run_md(system, st, n_steps=50, dt=0.004,
                               friction=1.0, temperature_K=300.0,
                               report_interval=50, force_fn=fn_md,
                               constraints=hspec)
                jax.block_until_ready(st.positions)
                t0 = time.perf_counter()
                st, _ = run_md(system, st, n_steps=50, dt=0.004,
                               friction=1.0, temperature_K=300.0,
                               report_interval=50, force_fn=fn_md,
                               constraints=hspec)
                jax.block_until_ready(st.positions)
                step_ms = (time.perf_counter() - t0) / 50 * 1e3
                out["gb_60k_ms_per_step"] = step_ms
                out["gb_60k_ns_per_day"] = (
                    0.004 * 1e-3 / (step_ms * 1e-3) * 86_400.0
                )
            dense_ms = DENSE_ANCHOR_MS * (system.n_atoms
                                          / DENSE_ANCHOR_N) ** 2
            out[f"gb_{label}_n_atoms"] = system.n_atoms
            out[f"gb_{label}_culled_ms_per_force"] = ms
            # the 26.8k denominator is MEASURED; the 60k one is the
            # quadratic extrapolation (dense cannot compile there), so
            # its key says so (advisor r4: estimated numbers must not
            # wear measured-looking names)
            suffix = "" if system.n_atoms <= DENSE_ANCHOR_N else "_extrapolated"
            out[f"gb_{label}_speedup_vs_dense{suffix}"] = dense_ms / ms
        out["gb_dense_anchor_ms_at_26800"] = DENSE_ANCHOR_MS
        out["gb_dense_compiles_at_60k"] = False  # VMEM OOM, measured
        return out
    except Exception as exc:  # pragma: no cover - bench resilience
        return {"gb_culled_error": str(exc)[:300]}


def bench_cpu_denominator() -> dict:
    """MEASURED secondary baseline: the same 32-replica alanine REMD
    workload on the host CPU via a JAX_PLATFORM_NAME=cpu subprocess
    (VERDICT r2 weak #4 — the OpenMM denominator stays an estimate
    until OpenMM exists in the image; this one is measured here)."""
    import subprocess
    import sys

    code = r"""
import json, time
import jax
jax.config.update("jax_platforms", "cpu")
from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange
system, positions = build_system(alanine_dipeptide_structure(), gb_model="gbn2")
cfg = RemdConfig(n_replicas=32, t_min=300.0, t_max=450.0,
                 exchange_frequency=100, report_interval=100,
                 dt_ps=0.002, seed=0, attempts_per_block=20)
remd = ReplicaExchange(system, positions, cfg)
remd.run(n_steps=2000)   # warm-up/compile
t0 = time.perf_counter()
remd.run(n_steps=2000)
wall = time.perf_counter() - t0
ns = 2000 * 0.002 * 1e-3 * 32
print(json.dumps({"cpu_ns_per_day": ns * 86400.0 / wall}))
"""
    try:
        import os

        env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=420, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)
    except Exception as exc:  # pragma: no cover
        return {"cpu_denominator_error": str(exc)[:200]}


#: analytic per-pair flop weights for the kernel-efficiency rows
_PAIR_FLOPS = 48


def _run_isolated(name: str, timeout_s: int = 3600) -> dict:
    """Run one bench function in a fresh subprocess.

    The long protein-REMD and 60k-GB rows have (rarely) taken the
    tunneled TPU worker down; a worker crash poisons every later chip
    call in the SAME process ("UNAVAILABLE" on all of them, as in the
    r4->r5 transition logs) but a fresh process reconnects cleanly. The
    rows share no compiled state with the main process, so isolation
    costs nothing beyond process startup."""
    import os
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "scripts/run_one_bench.py", name],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = r.stdout.splitlines()
        starts = [i for i, ln in enumerate(lines) if ln.startswith("{")]
        if not starts:
            tail = (r.stdout + r.stderr)[-200:]
            return {f"{name}_error": f"no JSON from subprocess: {tail}"}
        return json.loads("\n".join(lines[starts[-1]:]))
    except Exception as exc:  # pragma: no cover - bench resilience
        return {f"{name}_error": str(exc)[:200]}


def main() -> None:
    remd = bench_remd()
    msm = bench_msm()
    protein = bench_protein()
    explicit = bench_explicit()
    maxrep = bench_max_replicas()
    shared: dict = {}
    cells = bench_cells_25k(shared)
    npt_nve = bench_npt_and_nve(shared)
    dodec = bench_dodecahedron()
    # subprocess-isolated: a TPU-worker crash in these long rows must not
    # poison the rest of the harness (see _run_isolated docstring)
    ladder = _run_isolated("bench_protein_remd_production", timeout_s=3600)
    gb = _run_isolated("bench_gb_culled", timeout_s=1800)
    cpu = bench_cpu_denominator()
    value = remd["ns_per_day_aggregate"]

    # kernel-efficiency accounting (VERDICT r2 item #10): analytic flops
    # over measured wall — regressions become visible round-over-round
    if "protein_ms_per_step" in protein:
        n = protein["protein_n_atoms"]
        # GBn2 pair kernel: 3 dense sweeps (Born, energy/dEdB, forces)
        protein["protein_tflops_achieved"] = (
            3 * n * n * _PAIR_FLOPS / (protein["protein_ms_per_step"] * 1e-3)
            / 1e12
        )
    if "explicit_ms_per_step" in explicit:
        n = explicit["explicit_n_atoms"]
        explicit["explicit_tflops_achieved"] = (
            n * n * _PAIR_FLOPS / (explicit["explicit_ms_per_step"] * 1e-3)
            / 1e12
        )
    if "steps_per_second" in remd:
        # fused-REMD kernel: R replicas x 3 GBn2 sweeps over dense (N, N)
        # alanine pair blocks per step (swap-attempt work is negligible)
        n_ala = 22
        remd["remd_tflops_achieved"] = (
            remd["steps_per_second"] * 3 * n_ala * n_ala * _PAIR_FLOPS / 1e12
        )

    out = {
        "metric": "REMD aggregate ns/day (alanine, 32 replicas, 2 fs)",
        "value": round(value, 1),
        "unit": "ns/day",
        "vs_baseline": round(value / OPENMM_CPU_BASELINE_NS_PER_DAY, 2),
        "baseline_provenance": "documented estimate (864 ns/day aggregate); "
                               "measure via benchmark_openmm_baseline.py",
    }
    if "cpu_ns_per_day" in cpu:
        out["vs_jax_cpu_measured"] = round(value / cpu["cpu_ns_per_day"], 2)
        out["jax_cpu_ns_per_day_measured"] = round(cpu["cpu_ns_per_day"], 1)
    for d in (remd, msm, protein, explicit, maxrep, cells, npt_nve,
              dodec, ladder, gb, cpu):
        out.update({
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in d.items()
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
