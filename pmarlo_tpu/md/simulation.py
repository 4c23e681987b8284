"""``run_segment``: one single-temperature MD segment, end to end.

API-parity entry point for the reference's
src/pmarlo/simulation/__init__.py:18-112 (prepare system -> minimize ->
thermalize -> step -> report), with the OpenMM machinery replaced by the
jitted JAX pipeline. Output is device arrays plus an optional npz
trajectory on disk.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DEFAULT_FRICTION_PER_PS,
    DEFAULT_TEMPERATURE_K,
    DEFAULT_TIMESTEP_PS,
)
from ..io.trajectory import get_writer
from .integrate import run_md, thermalize
from .minimize import minimize_energy


def run_segment(
    pdb_file: "str | Path",
    *,
    n_steps: int = 10_000,
    temperature_K: float = DEFAULT_TEMPERATURE_K,
    dt_ps: float = DEFAULT_TIMESTEP_PS,
    friction_per_ps: float = DEFAULT_FRICTION_PER_PS,
    report_interval: int = 100,
    minimize_iterations: int = 500,
    seed: Optional[int] = None,
    output_file: Optional["str | Path"] = None,
    bias_fn: Optional[Callable] = None,
    implicit_solvent: bool = True,
    gb_model: str = "gbn2",
    force_path: str = "auto",
    cutoff: float = 0.9,
    switch_distance: Optional[float] = None,
    nonbonded: str = "auto",
    pme_precise: bool = False,
    constraints: Optional[str] = None,
    ensemble: str = "nvt",
    pressure_bar: float = 1.0,
    barostat_interval: int = 25,
    initial_state=None,
    initial_box=None,
    initial_barostat_state=None,
) -> Dict:
    """Run one Langevin segment. Returns a dict with device-resident
    trajectory arrays and summary scalars.

    ``initial_state`` (the ``final_state`` of a previous result)
    CONTINUES a run: minimize + thermalize are skipped and dynamics
    resume from the given positions/velocities/PRNG key — the OpenMM
    checkpoint-resume role, one segment chaining into the next. With
    ``seed=None`` (the default) the PRNG stream continues untouched, so
    a 200+200-step chain reproduces one 400-step run exactly; passing a
    seed on resume FOLDS it into the checkpoint key
    (``jax.random.fold_in``) — N walkers branched from one checkpoint
    with different seeds decorrelate instead of replaying the same
    noise. For NPT continuation pass ``initial_barostat_state`` (the
    previous result's ``final_barostat_state``) — it carries the
    evolved box, the self-tuned proposal width, and the barostat PRNG
    stream — or at minimum ``initial_box`` (the previous
    ``final_box``); resuming NPT with neither is an error, because the
    kernel grid would silently rebuild at the PDB's CRYST1 box while
    the positions are equilibrated to a different volume.

    Reference behavior mirrored: minimize -> set velocities to T ->
    step(n_steps) with frames every ``report_interval``
    (simulation/__init__.py:91-109). ``gb_model`` defaults to "gbn2" — the
    reference's amber14 + implicit/gbn2.xml (simulation/__init__.py:64-71).

    ``force_path``: "dense" (O(N^2) XLA, exact and fastest for small N),
    "pair_kernel" (tiled Pallas pair stage, md/pallas_pair.py — the
    protein-scale TPU fast path), or "auto" (pair kernel on TPU past
    ~600 atoms).

    A solvated input (CRYST1 box + waters, e.g. from
    ``Protein.save_structure`` after ``prepare(solvate=True)``) switches
    automatically to the EXPLICIT-solvent periodic path: LJ + Coulomb at
    ``cutoff``, rigid TIP3P via roll-layout SHAKE, Pallas kernels.
    ``nonbonded`` selects the explicit-path engine: "dense" (O(N^2)
    sweep + reaction field), "cells" (O(N) cell-list kernel + reaction
    field), "pme" (cell-list kernel + smooth-PME electrostatics), or
    "auto" (cells past 3000 atoms, dense below). ``switch_distance``
    (nm, explicit path only) enables the OpenMM-parity LJ switching
    function: unshifted LJ times the quintic smoothstep on
    [switch_distance, cutoff], taking LJ energy AND force smoothly to
    zero at the cutoff (NonbondedForce ``setUseSwitchingFunction``
    semantics) — tightens NVE conservation at a few extra vector ops
    per pair. ``pme_precise`` (PME engine, static-box ensembles)
    computes the reciprocal spreading weights in compensated df32
    arithmetic — ~3x lower mesh force noise for conservation-critical
    NVE work at near-zero cost (md/pme.py spread_charges_precise).

    ``constraints="hbonds"`` (implicit path) SHAKE/RATTLEs every X-H
    bond (OpenMM ``constraints=HBonds``): with the default HMR 3 amu
    this is the standard 4 fs implicit-solvent production protocol —
    pass ``dt_ps=0.004`` for ~2x throughput at unchanged configurational
    sampling. The explicit path always constrains (rigid TIP3P + X-H);
    ``constraints="none"`` is rejected there.

    ``ensemble="nve"`` runs microcanonical dynamics: velocities are
    still drawn at ``temperature_K`` (Maxwell-Boltzmann start), then the
    thermostat is off — zero friction turns the BAOAB splitting into
    plain velocity Verlet. The result dict gains a ``total_energy``
    trace (PE + KE per reported frame) so conservation can be checked
    directly; drift here is the guardrail that kernel forces are the
    exact gradient of the kernel energy.

    ``ensemble="npt"`` (explicit solvent only) adds the Monte-Carlo
    barostat (md/barostat.py): isotropic volume moves every
    ``barostat_interval`` steps at ``pressure_bar``, molecule-rigid
    scaling, self-tuning proposal width — the OpenMM
    ``MonteCarloBarostat`` role for density equilibration. Requires the
    cell-list engine (``nonbonded`` "cells"/"pme"/"auto"); the result
    dict gains ``box`` (F, 3) and ``density_g_cm3`` (F,) traces.
    """
    if ensemble not in ("nvt", "nve", "npt"):
        raise ValueError(f"ensemble must be nvt|nve|npt, got {ensemble!r}")
    if constraints not in (None, "none", "hbonds"):
        raise ValueError(
            f"constraints must be None|'none'|'hbonds', got {constraints!r}"
        )
    # zero friction = velocity Verlet (the O-step of BAOAB is identity)
    md_friction = 0.0 if ensemble == "nve" else friction_per_ps
    from ..io.cif import read_structure
    from .setup import build_explicit_setup, is_explicit_solvent

    structure = read_structure(pdb_file)
    explicit = is_explicit_solvent(structure)

    if explicit:
        if constraints == "none":
            raise ValueError(
                "constraints='none' is not available on the explicit-"
                "solvent path: rigid TIP3P water requires SHAKE (the "
                "default, OpenMM HBonds + rigidWater semantics)"
            )
        if initial_barostat_state is not None:
            box = tuple(float(b) for b in np.asarray(initial_barostat_state.box))
        elif initial_box is not None:
            box = tuple(initial_box)
        else:
            if ensemble == "npt" and initial_state is not None:
                raise ValueError(
                    "resuming ensemble='npt' needs initial_barostat_state "
                    "(or at least initial_box): the box evolved away from "
                    "the PDB's CRYST1 record during the previous segment"
                )
            box = structure.box
        tilt = getattr(structure, "tilt", None)
        if tilt is not None:
            # resuming with an evolved diagonal (NPT moves scale the
            # cell isotropically): the tilt scales by the same factor,
            # since the tilt RATIOS are invariant along the trajectory
            s_fac = float(box[0]) / float(structure.box[0])
            for k in (1, 2):
                s_k = float(box[k]) / float(structure.box[k])
                if abs(s_k - s_fac) > 1e-6 * max(abs(s_fac), 1.0):
                    raise ValueError(
                        "triclinic resume box must be an ISOTROPIC "
                        "scale of the structure's CRYST1 cell (the "
                        "barostat only ever scales isotropically); got "
                        f"per-axis factors ({s_fac:.6f}, "
                        f"{float(box[1]) / float(structure.box[1]):.6f}, "
                        f"{float(box[2]) / float(structure.box[2]):.6f})"
                    )
            if abs(s_fac - 1.0) > 1e-12:
                tilt = tuple(float(t) * s_fac for t in tilt)
        # NPT gets the LJ tail term (OpenMM useDispersionCorrection
        # default): its 1/V dependence sets the equilibrium density
        # (~0.98 vs 0.968 g/cm^3 measured on a 27k TIP3P box). The
        # FULL-system force fn (stiff X-H bonds kept) is only ever
        # consumed by the minimizer — resume skips its grid/exclusion
        # setup entirely.
        setup = build_explicit_setup(
            structure, box=box, tilt=tilt, cutoff=cutoff,
            switch_distance=switch_distance,
            nonbonded=nonbonded, pme_precise=pme_precise,
            require_cells=(ensemble == "npt"),
            dispersion_correction=(ensemble == "npt"),
            build_minimize_fn=initial_state is None,
        )
        system, positions = setup.system, setup.positions
        md_system, constraints = setup.md_system, setup.constraints
        md_base_fn, base_fn = setup.md_force_fn, setup.minimize_force_fn
        nonbonded = setup.nonbonded
        from .setup import compose_bias

        _force_fn = (compose_bias(md_base_fn, bias_fn)
                     if bias_fn is not None else md_base_fn)
        # minimize through the same tiled periodic kernel MD uses — the
        # dense XLA energy would cap solvated size by minimizer memory
        if initial_state is not None:
            state = _check_resume_state(initial_state, system, seed)
            e_min = float("nan")
        else:
            key = jax.random.PRNGKey(2024 if seed is None else seed)
            x_min, e_min = minimize_energy(
                system, positions, max_iterations=minimize_iterations,
                bias_fn=bias_fn, force_fn=base_fn,
            )
            state = thermalize(system, x_min, key, temperature_K)
        if ensemble == "npt":
            if nonbonded == "dense":
                raise ValueError(
                    "ensemble='npt' needs the cell-list engine "
                    "(nonbonded='cells' or 'pme')"
                )
            from .barostat import run_npt

            final_state, bstate, frames = run_npt(
                md_system, state, n_steps=n_steps, dt=dt_ps,
                friction=friction_per_ps, temperature_K=temperature_K,
                pressure_bar=pressure_bar,
                barostat_interval=barostat_interval,
                report_interval=report_interval, force_fn=md_base_fn,
                constraints=constraints, full_system=system,
                seed=2024 if seed is None else seed,
                barostat_state=initial_barostat_state,
                bias_fn=bias_fn,
            )
            result = _package_result(
                system, final_state, frames, e_min, n_steps, dt_ps,
                temperature_K, report_interval, output_file,
                box_trace=frames["box"],
            )
            result["box"] = frames["box"]
            result["density_g_cm3"] = frames["density_g_cm3"]
            result["barostat_acceptance"] = float(
                bstate.n_accepted) / max(float(bstate.n_attempted), 1.0)
            result["final_box"] = np.asarray(bstate.box)
            # continuation handle: box + tuned proposal width + move PRNG
            result["final_barostat_state"] = bstate
            return result
        # bias is already composed into _force_fn above; run_md refuses
        # the ambiguous force_fn+bias_fn combination
        final_state, frames = run_md(
            system, state, n_steps=n_steps, dt=dt_ps,
            friction=md_friction, temperature_K=temperature_K,
            report_interval=report_interval,
            force_fn=_force_fn, constraints=constraints,
        )
        result = _package_result(
            system, final_state, frames, e_min, n_steps, dt_ps,
            temperature_K, report_interval, output_file,
        )
        if ensemble == "nve":
            from .constraints import n_constraints as _nc

            _attach_total_energy(
                result, system, _nc(constraints) if constraints else 0
            )
        return result

    if ensemble == "npt":
        raise ValueError(
            "ensemble='npt' requires an explicit-solvent periodic input "
            "(CRYST1 box + waters); this structure routed to the "
            "implicit-solvent path"
        )
    if switch_distance is not None:
        raise ValueError(
            "switch_distance applies to the explicit-solvent periodic "
            "path only; this structure routed to the implicit-solvent "
            "path (NoCutoff, nothing to switch)"
        )
    if pme_precise:
        raise ValueError(
            "pme_precise applies to the explicit-solvent PME path only; "
            "this structure routed to the implicit-solvent path "
            "(no reciprocal mesh)"
        )
    # shared implicit setup (md/setup.py): system, 4 fs X-H constraint
    # protocol (HMR 3 amu default), and the SINGLE auto force-path rule
    # run_segment and run_replica_exchange must agree on
    from .setup import build_implicit_setup

    isetup = build_implicit_setup(
        structure, implicit_solvent=implicit_solvent, gb_model=gb_model,
        constraints=constraints, force_path=force_path,
    )
    system, positions = isetup.system, isetup.positions
    hspec, base_fn = isetup.constraints, isetup.force_fn
    if base_fn is not None and bias_fn is not None:
        def force_fn(x, _f=base_fn):
            e, f = _f(x)
            be, bg = jax.value_and_grad(bias_fn)(x)
            return e + be, f - bg
    else:
        force_fn = base_fn

    if initial_state is not None:
        state = _check_resume_state(initial_state, system, seed)
        e_min = float("nan")
    else:
        key = jax.random.PRNGKey(2024 if seed is None else seed)
        x_min, e_min = minimize_energy(
            system, positions, max_iterations=minimize_iterations,
            bias_fn=bias_fn
        )
        state = thermalize(system, x_min, key, temperature_K)

    final_state, frames = run_md(
        system,
        state,
        n_steps=n_steps,
        dt=dt_ps,
        friction=md_friction,
        temperature_K=temperature_K,
        report_interval=report_interval,
        # the pair-kernel path composes bias into force_fn itself;
        # bias_fn only goes through when run_md self-builds (dense)
        bias_fn=bias_fn if force_fn is None else None,
        force_fn=force_fn,
        constraints=hspec,
    )

    result = _package_result(
        system, final_state, frames, e_min, n_steps, dt_ps,
        temperature_K, report_interval, output_file,
    )
    if ensemble == "nve":
        from .constraints import n_constraints as _nc

        _attach_total_energy(result, system, _nc(hspec) if hspec else 0)
    return result


def _check_resume_state(initial_state, system, seed):
    """Validate a resume MDState against the built system; fold an
    explicit ``seed`` into the checkpoint's PRNG key (branching N
    walkers from one checkpoint with different seeds must decorrelate,
    not replay the same noise stream)."""
    from .integrate import MDState

    if not isinstance(initial_state, MDState):
        raise ValueError(
            f"initial_state must be an MDState (a previous result's "
            f"['final_state'] entry, not the result dict itself); got "
            f"{type(initial_state).__name__}"
        )
    shp = tuple(initial_state.positions.shape)
    vshp = tuple(initial_state.velocities.shape)
    if shp != (system.n_atoms, 3) or vshp != shp:
        raise ValueError(
            f"initial_state has positions {shp} / velocities {vshp}, but "
            f"this structure builds a {system.n_atoms}-atom system — "
            "resume states must come from a previous run_segment on the "
            "same input"
        )
    if seed is None:
        return initial_state
    import dataclasses

    return dataclasses.replace(
        initial_state, key=jax.random.fold_in(initial_state.key, seed)
    )


def _attach_total_energy(result, system, n_con: int) -> None:
    """total_energy (F,) = PE + KE, with KE recovered from the reported
    kinetic temperature. Only called on NVE results, whose reporter uses
    the remove_com convention (integrate.py instantaneous_temperature:
    3N - 3 - n_con dof) — the inversion here must match EXACTLY or
    total_energy = PE + KE*(wrong dof ratio) shows spurious drift."""
    from .vsites import n_vsites

    n_dof = max(3 * (system.n_atoms - n_vsites(system)) - 3 - int(n_con), 1)
    from ..constants import BOLTZMANN_CONSTANT_KJ_PER_MOL

    ke = (0.5 * n_dof * BOLTZMANN_CONSTANT_KJ_PER_MOL
          * np.asarray(result["temperature"]))
    result["total_energy"] = np.asarray(result["potential_energy"]) + ke


def _package_result(system, final_state, frames, e_min, n_steps, dt_ps,
                    temperature_K, report_interval, output_file,
                    box_trace=None):
    result = {
        "system": system,
        "final_state": final_state,
        "positions": frames["positions"],          # (F, N, 3) device
        "potential_energy": frames["potential_energy"],
        "temperature": frames["temperature"],
        "minimized_energy": e_min,
        "n_steps": n_steps,
        "dt_ps": dt_ps,
        "temperature_K": temperature_K,
    }
    if output_file is not None:
        # dispatch by suffix: .dcd/.xtc format writers (cell records
        # from the metadata box/tilt/box_trace), else the npz store
        writer = get_writer(
            Path(output_file),
            metadata={
                "temperature_K": temperature_K,
                "dt_ps": dt_ps,
                "report_interval": report_interval,
                "n_steps": n_steps,
                "atom_names": list(system.atom_names),
                "residue_names": list(system.residue_names),
                "residue_ids": list(system.residue_ids),
                # periodic-cell provenance (None for implicit solvent):
                # analysis (RDF min-image, MSD unwrapping) and format
                # conversion need the lattice, not just coordinates
                "box": (list(system.box) if system.box is not None
                        else None),
                "tilt": (list(system.tilt) if system.tilt is not None
                         else None),
                # NPT: per-frame diagonals so format writers stamp the
                # EVOLVING lattice, not the build-time cell
                "box_trace": (np.asarray(box_trace).tolist()
                              if box_trace is not None else None),
            },
        )
        writer.write_frames(np.asarray(frames["positions"]))
        writer.close()
        result["output_file"] = Path(output_file)
    return result


__all__ = ["run_segment"]
