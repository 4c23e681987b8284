"""Solvated-protein REMD, end to end (the round-3 flagship workflow).

A reference user's complete loop — prep, replica exchange, demux,
features, MSM/FES — on a workload the reference cannot run at all:
explicit-solvent REMD (its MD layer is implicit-solvent OpenMM only,
/root/reference/src/pmarlo/simulation/__init__.py:64-71, and REMD was
removed upstream; SURVEY.md section 2c reconstructs the contract).

Pipeline:
  raw chignolin PDB
  -> Protein(...).prepare(solvate=True)      TIP3P box + ions (CRYST1)
  -> run_replica_exchange(...)               auto-detects the solvated
     input and switches to the explicit path: periodic LJ + Coulomb,
     rigid-water SHAKE in every replica, acceptance-targeted ladder
     from short energy-fluctuation probes (remd/ladder.py)
  -> demux by temperature                    rung-major trajectories
  -> phi/psi featurization (JAX kernels)
  -> MSM + free-energy surface at T_min

Run: JAX_PLATFORM_NAME=cpu python examples/20_solvated_remd_workflow.py --quick
     (--quick: small padding + short window, ~3 min on CPU;
      drop the flag on a TPU for the production-scale settings)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PDB = "/root/reference/data/chignolin.pdb"
OUT = Path(__file__).parent / "outputs" / "solvated_remd"


def main():
    quick = "--quick" in sys.argv
    t0 = time.time()
    OUT.mkdir(parents=True, exist_ok=True)

    from pmarlo_tpu.features.builtins import (
        compute_dihedrals,
        phi_psi_indices,
    )
    from pmarlo_tpu.msm.estimation import build_simple_msm
    from pmarlo_tpu.msm.clustering import cluster_microstates
    from pmarlo_tpu.protein.protein import Protein
    from pmarlo_tpu.remd.remd import RemdConfig, run_replica_exchange

    # 1. prep: protonate, solvate, neutralize (PDBFixer-parity prep)
    p = Protein(PDB, ph=7.0).prepare(
        solvate=True, solvent_padding=0.6 if quick else 0.9
    )
    solvated = p.save_structure(OUT / "chignolin_solvated.pdb")
    n_waters = sum(1 for r in p.structure.residues if r.name == "HOH")

    # 2. one-call solvated REMD with an acceptance-designed ladder.
    #    The facade detects the CRYST1 box + waters and runs the
    #    explicit path (rigid TIP3P SHAKE, periodic kernel) per replica.
    cfg = RemdConfig(
        n_replicas=4,
        t_min=300.0,
        t_max=320.0 if quick else 340.0,
        exchange_frequency=50,
        report_interval=50,
        dt_ps=0.002,
        seed=7,
    )
    n_steps = 500 if quick else 20_000
    res, system = run_replica_exchange(
        solvated, n_steps=n_steps, config=cfg,
        target_acceptance=None if quick else 0.3,
    )
    acc = res.acceptance_matrix
    acc_mean = float(np.nanmean(acc)) if np.isfinite(acc).any() else 0.0

    # 3. demux: rung-major layout = trajectories per temperature by
    #    construction (remd/remd.py design); take the T_min rung
    demuxed = np.asarray(res.positions)[:, 0]        # (frames, N, 3)

    # 4. featurize: backbone phi/psi through the JAX dihedral kernels
    phi_quads, psi_quads, _ = phi_psi_indices(
        system.atom_names, system.residue_ids
    )
    phi = np.asarray(compute_dihedrals(demuxed, phi_quads))
    psi = np.asarray(compute_dihedrals(demuxed, psi_quads))
    feats2d = np.concatenate([phi, psi], axis=-1)     # (frames, 2*res)

    # 5. MSM at T_min (tiny in --quick mode; the API path is the point)
    n_states = min(8, max(2, feats2d.shape[0] // 2))
    clust = cluster_microstates(feats2d, n_states=n_states, seed=0)
    T, pi = build_simple_msm(
        [np.asarray(clust.labels)], lag=1, n_states=n_states
    )
    kT = 0.0083145 * cfg.t_min
    f_state = -kT * np.log(np.maximum(np.asarray(pi), 1e-12))
    f_state -= f_state.min()

    summary = {
        "n_atoms": system.n_atoms,
        "n_waters": n_waters,
        "box_nm": [float(b) for b in system.box],
        "ladder_K": [float(t) for t in res.temperatures],
        "mean_swap_acceptance": acc_mean,
        "n_frames_demuxed": int(demuxed.shape[0]),
        "n_msm_states": int(n_states),
        "state_free_energies_kJ_mol": [float(v) for v in f_state],
        "wall_s": time.time() - t0,
        "quick": quick,
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
