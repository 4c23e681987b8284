"""Per-term NVE drift attribution for the PME path (VERDICT r4 item 3).

Runs the 27k-atom TIP3P box (the bench_cells_25k geometry) under NVE
(friction = 0 -> velocity Verlet) with four electrostatics variants and
reports the secular total-energy drift in kT/dof/ns for each:

  rf                  reaction field (always energy-shifted; the 0.098
                      control)
  pme_unshifted       round-4 behavior: hard erfc truncation at rc —
                      every cutoff crossing jumps E by ke qq erfc(a rc)/rc
  pme_shift           round-5 default: erfc term shifted to zero at rc
                      (continuous potential, forces identical)
  pme_precise_shift   shift + df32 reciprocal spreading

The hypothesis under test: the round-4 drift floor (0.53-0.58) was the
truncation discontinuity, not reciprocal mesh noise — RF (shifted by
construction via c_rf) always conserved 6x better on the same box, and
cutting mesh force noise 2.9x (pme_precise) barely moved the drift.

Run on the real chip:  python scripts/pme_drift_attribution.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
    from pmarlo_tpu.md.constraints import (
        build_h_constraints,
        n_constraints,
        strip_constrained_bonded,
    )
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import kinetic_energy, run_md, thermalize
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    n_side, spacing = 21, 0.31
    residues, rid = [], 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                ox, oy, oz = (0.15 + i * spacing, 0.15 + j * spacing,
                              0.15 + k * spacing)
                mk = lambda n_, x_, y_, z_, e_: PDBAtom(
                    name=n_, resname="HOH", resid=rid, chain="W",
                    xyz=(x_, y_, z_), element=e_)
                residues.append(PDBResidue(
                    name="HOH", resid=rid, chain="W",
                    atoms=[mk("O", ox, oy, oz, "O"),
                           mk("H1", ox + 0.09572, oy, oz, "H"),
                           mk("H2", ox - 0.02399, oy + 0.09266, oz, "H")]))
                rid += 1
    L = n_side * spacing + 0.1
    system, x0 = build_system(PDBStructure(residues=residues),
                              box=(L, L, L), cutoff=0.9,
                              hydrogen_mass=None)
    spec = build_h_constraints(system)
    md_system = strip_constrained_bonded(system)
    st0 = thermalize(system, jnp.asarray(x0, jnp.float32),
                     jax.random.PRNGKey(0), 300.0)

    variants = {
        "rf": dict(electrostatics="rf"),
        "pme_unshifted": dict(electrostatics="pme", ewald_shift=False),
        "pme_shift": dict(electrostatics="pme"),
        "pme_precise_shift": dict(electrostatics="pme", pme_precise=True),
    }
    dt = 0.002
    n_dof = 3 * system.n_atoms - 3 - n_constraints(spec)
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * 300.0
    n_seg, seg = 12, 500

    out = {}
    for name, kw in variants.items():
        t_start = time.perf_counter()
        fn = build_cell_force_fn(md_system, **kw)
        # NVT settle (thermostat on) so every variant starts from an
        # equilibrated phase point of ITS OWN potential
        st, _ = run_md(system, st0, n_steps=100, dt=dt, friction=1.0,
                       temperature_K=300.0, report_interval=100,
                       force_fn=fn, constraints=spec)

        def etot(s):
            e, _f = fn(s.positions)
            return float(e) + float(kinetic_energy(system, s.velocities))

        es = [etot(st)]
        for _ in range(n_seg):
            st, _ = run_md(system, st, n_steps=seg, dt=dt, friction=0.0,
                           temperature_K=300.0, report_interval=seg,
                           force_fn=fn, constraints=spec)
            es.append(etot(st))
        t_ns = np.arange(n_seg + 1) * seg * dt * 1e-3
        slope = float(np.polyfit(t_ns, np.asarray(es), 1)[0])
        drift = slope / kT / n_dof
        out[name] = round(drift, 4)
        print(json.dumps({
            "variant": name,
            "drift_kT_per_dof_per_ns": round(drift, 4),
            "wall_s": round(time.perf_counter() - t_start, 1),
        }), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
