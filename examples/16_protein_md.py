"""Protein-scale MD end to end: raw X-ray PDB -> prepared system ->
tiled-kernel MD -> Ramachandran analysis.

Round-2 capability demo (no reference example exists at this scale — the
reference delegated protein MD entirely to OpenMM, simulation/
__init__.py:64-109):

  1. ``Protein.prepare()``: heterogen removal, pH protonation, disulfide
     detection, geometric hydrogen addition (protein/hydrogens.py).
  2. ``create_system()``: amber-family force field + GBn2 implicit
     solvent (md/gbn2.py).
  3. MD with the tiled Pallas pair kernel (md/pallas_pair.py) — 3gd8
     (3,350 atoms) runs ~64 ns/day on one TPU v5e chip.
  4. phi/psi extraction + basin populations from the trajectory.

Run: python examples/16_protein_md.py [--quick] [path/to.pdb]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

from pmarlo_tpu.features.base import TopologyInfo
from pmarlo_tpu.features.ramachandran import compute_ramachandran
from pmarlo_tpu.md.integrate import run_md, thermalize
from pmarlo_tpu.md.minimize import minimize_energy
from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
from pmarlo_tpu.protein.protein import Protein

DEFAULT_PDB = "/root/reference/tests/_assets/3gd8.pdb"


def main():
    quick = "--quick" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pdb = args[0] if args else DEFAULT_PDB
    if not Path(pdb).exists():
        print(f"PDB not found: {pdb}")
        return

    t0 = time.time()
    protein = Protein(pdb, ph=7.0).prepare()
    props = protein.get_properties()
    print(f"prepared {props['n_residues']} residues / {props['n_atoms']} atoms "
          f"(charge {props['formal_charge']}, pI {props['isoelectric_point']}) "
          f"in {time.time() - t0:.1f}s")

    system, positions = protein.create_system()  # gbn2 default
    on_tpu = jax.default_backend() == "tpu"
    # the tiled kernel is the TPU fast path; off-TPU fall back to the
    # dense XLA path (interpret mode at N=3350 would take minutes/step)
    force_fn = build_pair_force_fn(system) if on_tpu else None

    xmin, e_min = minimize_energy(system, positions)
    print(f"minimized: {float(e_min):.1f} kJ/mol")
    state = thermalize(system, xmin, jax.random.PRNGKey(0), 300.0)

    n_steps = 200 if quick else 5_000
    report = 100 if quick else 500
    t0 = time.time()
    state, frames = run_md(
        system, state, n_steps=n_steps, dt=0.002, friction=1.0,
        temperature_K=300.0, report_interval=report, force_fn=force_fn,
    )
    jax.block_until_ready(frames["positions"])
    wall = time.time() - t0
    ns_day = n_steps * 0.002e-3 / wall * 86_400.0
    print(f"{n_steps} steps in {wall:.1f}s (incl. compile) -> "
          f"{ns_day:.1f} ns/day lower bound")

    pos = np.asarray(frames["positions"])
    phi, psi, labels = compute_ramachandran(
        pos, TopologyInfo.from_topology(protein.topology)
    )
    frac_neg_phi = float(np.mean(phi < 0))
    summary = {
        "pdb": str(pdb),
        "n_atoms": int(system.n_atoms),
        "n_steps": n_steps,
        "ns_per_day_lower_bound": round(ns_day, 2),
        "mean_temperature_K": round(float(np.asarray(frames["temperature"]).mean()), 1),
        "final_energy_kJ_mol": round(float(np.asarray(frames["potential_energy"])[-1]), 1),
        "n_phi_psi_residues": len(labels),
        "frac_negative_phi": round(frac_neg_phi, 3),
    }
    out_dir = Path(__file__).parent / "outputs" / "protein_md"
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
