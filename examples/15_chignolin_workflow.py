"""Full production workflow on chignolin (BASELINE.json configs 4+5):
multi-shard REMD sampling -> DeepTICA CV training -> CV-biased resampling
-> shard store -> MSM/ITS/FES -> PCCA+/TPT conformations, orchestrated by
the staged Pipeline with timing banners and resume.

Run (TPU): python examples/15_chignolin_workflow.py
Quick CPU smoke: JAX_PLATFORM_NAME=cpu python examples/15_chignolin_workflow.py --quick
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from pmarlo_tpu.analysis.discretize import discretize_dataset
from pmarlo_tpu.bias import HarmonicExpansionBias, make_cv_bias_fn
from pmarlo_tpu.bias.harmonic import make_feature_cv_fn, make_phi_psi_feature_fn
from pmarlo_tpu.conformations.finder import find_conformations
from pmarlo_tpu.data import chignolin_path
from pmarlo_tpu.features.base import TopologyInfo
from pmarlo_tpu.features.featurize import featurize_trajectory
from pmarlo_tpu.io.pdb import read_pdb
from pmarlo_tpu.io.shards import emit_shards_from_trajectory, read_shard, select_shard_paths
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.topology import build_topology
from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica
from pmarlo_tpu.msm.free_energy import generate_2d_fes
from pmarlo_tpu.msm.its import compute_implied_timescales
from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange
from pmarlo_tpu.utils.profiling import StageTimer
from pmarlo_tpu.workflow import Pipeline

QUICK = "--quick" in sys.argv
OUT = Path(__file__).parent / "outputs" / "chignolin_workflow"
N_REPLICAS = 4 if QUICK else 16
SEED_STEPS = 2_000 if QUICK else 50_000
BIAS_STEPS = 2_000 if QUICK else 50_000
FRAMES_PER_SHARD = 20 if QUICK else 100

timer = StageTimer()


def stage_prepare(ctx):
    path = chignolin_path()
    if path is None:
        raise FileNotFoundError("no chignolin PDB available")
    topo = build_topology(read_pdb(path, model=1))
    system, positions = build_system(topo)
    info = TopologyInfo.from_topology(topo)
    return {"system": system, "positions": positions, "topo": topo, "info": info}


def stage_seed_remd(ctx):
    with timer.stage("seed_remd", n_items=SEED_STEPS * N_REPLICAS) as box:
        cfg = RemdConfig(
            n_replicas=N_REPLICAS, t_min=300, t_max=450,
            exchange_frequency=100, report_interval=100,
            equilibration_steps=0 if QUICK else 2000, seed=7,
        )
        remd = ReplicaExchange(ctx["system"], ctx["positions"], cfg)
        result = remd.run(n_steps=SEED_STEPS)
        box["pos"] = result.positions
    return {"seed_result": result, "remd_cfg": cfg}


def stage_featurize_and_shard(ctx):
    with timer.stage("featurize"):
        result = ctx["seed_result"]
        shard_dir = OUT / "shards"
        for rung in range(min(4, N_REPLICAS)):
            traj = result.demuxed_trajectory(rung)
            X, _ = featurize_trajectory(
                traj, "phi_psi", ctx["info"], cos_sin_expand=True
            )
            emit_shards_from_trajectory(
                shard_dir, np.asarray(X),
                temperature_K=float(result.temperatures[rung]),
                run_id="seed", frames_per_shard=FRAMES_PER_SHARD,
                dt_ps=0.002, feature_spec=["phi_psi"],
            )
    return {"shard_dir": shard_dir}


def stage_train_cv(ctx):
    with timer.stage("deeptica"):
        shards = [read_shard(p) for p in select_shard_paths(ctx["shard_dir"])]
        feats = [s["features"] for s in shards]
        cfg = DeepTICAConfig(
            lag=2 if QUICK else 5, n_out=2, hidden=(32, 32),
            max_epochs=5 if QUICK else 60,
            batch_size=32 if QUICK else 256,
            early_stopping_patience=10, seed=3,
        )
        model = train_deeptica(feats, cfg)
        model.save(OUT / "cv" / "deeptica")
    return {"cv_model": model}


def stage_biased_remd(ctx):
    with timer.stage("biased_remd", n_items=BIAS_STEPS * N_REPLICAS):
        info = ctx["info"]
        feature_fn = make_phi_psi_feature_fn(info.atom_names, info.residue_ids)
        cv_fn = make_feature_cv_fn(feature_fn, ctx["cv_model"].as_function())
        bias_fn = make_cv_bias_fn(cv_fn, HarmonicExpansionBias(strength=1.0))
        remd = ReplicaExchange(
            ctx["system"], ctx["positions"], ctx["remd_cfg"], bias_fn=bias_fn
        )
        result = remd.run(n_steps=BIAS_STEPS)
        for rung in range(min(4, N_REPLICAS)):
            traj = result.demuxed_trajectory(rung)
            X, _ = featurize_trajectory(
                traj, "phi_psi", info, cos_sin_expand=True
            )
            emit_shards_from_trajectory(
                ctx["shard_dir"], np.asarray(X),
                temperature_K=float(result.temperatures[rung]),
                run_id="biased", frames_per_shard=FRAMES_PER_SHARD,
                dt_ps=0.002, feature_spec=["phi_psi"],
                bias={"kind": "deeptica_harmonic", "strength": 1.0},
            )
    return {"biased_result": result}


def stage_estimate(ctx):
    with timer.stage("estimation"):
        shards = [read_shard(p) for p in select_shard_paths(ctx["shard_dir"])]
        disc = discretize_dataset(
            shards, n_states=10 if QUICK else 50, lag=2 if QUICK else 10, seed=0
        )
        its = compute_implied_timescales(
            disc.dtrajs, lags=[1, 2, 5] if QUICK else None,
            n_states=disc.n_states, n_samples=10 if QUICK else 100,
        )
        pooled = np.concatenate([s["features"] for s in shards])
        fes = generate_2d_fes(
            pooled[:, 0], pooled[:, 1], temperature_K=300.0, bins=24
        )
    return {"disc": disc, "its": its, "fes": fes,
            "n_shards": len(shards), "n_frames": int(pooled.shape[0])}


def stage_conformations(ctx):
    with timer.stage("conformations"):
        disc = ctx["disc"]
        active = disc.active_states
        T = disc.transition_matrix[np.ix_(active, active)]
        T = T / T.sum(axis=1, keepdims=True)
        cs = find_conformations(T, n_macrostates=2, committor_tolerance=0.2)
        cs.save(OUT / "conformations.json")
    return {"conformations": cs}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    pipe = Pipeline("chignolin", checkpoint=OUT / "pipeline.json")
    pipe.add("prepare", stage_prepare)
    pipe.add("seed_remd", stage_seed_remd)
    pipe.add("featurize", stage_featurize_and_shard)
    pipe.add("train_cv", stage_train_cv)
    pipe.add("biased_remd", stage_biased_remd)
    pipe.add("estimate", stage_estimate)
    pipe.add("conformations", stage_conformations)
    ctx = pipe.run({}, resume=False)

    summary = {
        "n_shards": ctx["n_shards"],
        "n_frames": ctx["n_frames"],
        "n_active_states": int(len(ctx["disc"].active_states)),
        "its_plateau": ctx["its"].plateau_lag,
        "slowest_timescale": float(ctx["its"].timescales[-1, 0]),
        "fes_finite_fraction": ctx["fes"].finite_fraction,
        "n_conformations": len(ctx["conformations"].conformations),
        "cv_vamp2": ctx["cv_model"].training_history["best"]["val_vamp2"],
        "stages": timer.summary(),
    }
    print(json.dumps(summary, indent=2, default=str))
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2, default=str))


if __name__ == "__main__":
    main()
