"""Measure the OpenMM-CPU baseline denominator for bench.py.

Run this in ANY environment that has OpenMM installed (it is deliberately
not a dependency of pmarlo_tpu; this TPU image does not ship it):

    python benchmark_openmm_baseline.py [path/to/alanine-dipeptide.pdb]

It reproduces the reference's exact MD configuration
(src/pmarlo/simulation/__init__.py:18-112: amber14-all + implicit/gbn2,
NoCutoff, HBonds constraints, HMR 1.5 amu, LangevinMiddle 2 fs, CPU
platform) and prints the single-replica ns/day plus the 32-replica
aggregate that bench.py's OPENMM_CPU_BASELINE_NS_PER_DAY denominator
represents. Copy the printed value into bench.py to replace the
documented estimate with a measurement for your hardware.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    try:
        import openmm
        from openmm import app, unit
    except ImportError:
        sys.exit(
            "OpenMM is not installed in this environment. Run this script "
            "where it is (e.g. `pip install openmm`), then transcribe the "
            "measured value into bench.py."
        )

    pdb_path = sys.argv[1] if len(sys.argv) > 1 else "alanine-dipeptide.pdb"
    pdb = app.PDBFile(pdb_path)
    ff = app.ForceField("amber14-all.xml", "implicit/gbn2.xml")
    system = ff.createSystem(
        pdb.topology,
        nonbondedMethod=app.NoCutoff,
        constraints=app.HBonds,
        hydrogenMass=1.5 * unit.amu,
    )
    integrator = openmm.LangevinMiddleIntegrator(
        300 * unit.kelvin, 1.0 / unit.picosecond, 0.002 * unit.picoseconds
    )
    platform = openmm.Platform.getPlatformByName("CPU")
    sim = app.Simulation(pdb.topology, system, integrator, platform)
    sim.context.setPositions(pdb.positions)
    sim.minimizeEnergy(maxIterations=100)
    sim.context.setVelocitiesToTemperature(300 * unit.kelvin)

    n_steps = 50_000
    sim.step(5_000)  # warm-up
    t0 = time.perf_counter()
    sim.step(n_steps)
    wall = time.perf_counter() - t0
    ns_day = n_steps * 0.002e-3 / wall * 86_400.0
    print(json.dumps({
        "metric": "OpenMM-CPU alanine GBn2 throughput",
        "single_replica_ns_per_day": round(ns_day, 1),
        "aggregate_32_replicas_ns_per_day": round(ns_day * 32, 1),
        "wall_s": round(wall, 2),
        "platform": "CPU",
        "note": "paste aggregate value into bench.py "
                "OPENMM_CPU_BASELINE_NS_PER_DAY",
    }))


if __name__ == "__main__":
    main()
