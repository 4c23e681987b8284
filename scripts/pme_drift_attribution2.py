"""PME drift attribution, part 2: isolate the reciprocal mesh term.

Part 1 (scripts/pme_drift_attribution.py, measured on chip 2026-08-19)
ruled out the real-space truncation discontinuity: shifting the erfc
term moved drift only 0.577 -> 0.559 (RF control 0.098). The remaining
candidates are (a) the reciprocal mesh term (autodiff forces through
f32 spreading+FFT) and (b) the erfc real-space kernel / exclusion
corrections themselves.

Decisive split by force-fn COMPOSITION (conservation analysis does not
need a physical potential, only a conservative one):

  rf_plus_recip     RF force fn + reciprocal term (grad via autodiff)
                    -> drift isolates the mesh term's contribution
  pme_minus_recip   full PME - the identical reciprocal term
                    -> drift isolates erfc real space + corrections

Run on the real chip:  python - < scripts/pme_drift_attribution2.py
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
    from pmarlo_tpu.md.pme import ewald_alpha, reciprocal_energy

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

    fn_rf = build_cell_force_fn(md_system)
    fn_pme = build_cell_force_fn(md_system, electrostatics="pme")
    q = jnp.asarray(md_system.charges, jnp.float32)
    box = tuple(float(b) for b in md_system.box)
    alpha = ewald_alpha(float(md_system.cutoff), 5e-4)
    shape = fn_pme.pme_mesh_shape
    order = fn_pme.pme_order

    def recip(x, precise=False):
        return reciprocal_energy(x, q, box, alpha, shape, order,
                                 precise=precise)

    def rf_plus_recip(x):
        e, f = fn_rf(x)
        er, gr = jax.value_and_grad(recip)(x)
        return e + er, f - gr

    def rf_plus_recip_precise(x):
        e, f = fn_rf(x)
        er, gr = jax.value_and_grad(lambda v: recip(v, True))(x)
        return e + er, f - gr

    def pme_minus_recip(x):
        e, f = fn_pme(x)
        er, gr = jax.value_and_grad(recip)(x)
        return e - er, f + gr

    variants = {
        "rf_plus_recip": rf_plus_recip,
        "rf_plus_recip_precise": rf_plus_recip_precise,
        "pme_minus_recip": pme_minus_recip,
    }
    dt = 0.002
    n_dof = 3 * system.n_atoms - 3 - n_constraints(spec)
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * 300.0
    n_seg, seg = 12, 500

    out = {}
    for name, fn in variants.items():
        t_start = time.perf_counter()
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
