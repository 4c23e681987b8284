"""Shared explicit-solvent MD setup: one recipe for every entry point.

``run_segment`` (md/simulation.py) and ``run_replica_exchange``
(remd/remd.py) both accept a solvated PDB and must build the SAME
physics from it — water detection, nonbonded engine selection, rigid
water/H-bond constraints, constrained-bonded stripping, and the
dual minimize/MD force-fn split (minimization relaxes the FULL system
including stiff X-H bonds; MD runs the stripped system under SHAKE,
OpenMM createSystem semantics). Keeping two inline copies let them
drift (the REMD copy missed NPT routing and dispersion wiring) — this
module is the single source.

Replaces the system-construction role of the reference's OpenMM
createSystem call (src/pmarlo/simulation/__init__.py:64-71) for the
periodic path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax

from .forcefield import System, build_system
from .topology import _WATER_NAMES


def is_explicit_solvent(structure) -> bool:
    """A periodic box AND waters = explicit-solvent input. The shared
    water-name set (HOH/WAT/TIP3/SOL) keeps GROMACS-style SOL boxes on
    the explicit path instead of silently dropping their waters."""
    has_waters = any(r.name in _WATER_NAMES for r in structure.residues)
    return getattr(structure, "box", None) is not None and has_waters


@dataclasses.dataclass
class ExplicitSetup:
    """Everything an explicit-solvent driver needs, built consistently."""

    system: System               # full system (stiff X-H bonds kept)
    md_system: System            # constrained bonded terms stripped
    positions: jax.Array
    constraints: object          # SHAKE/RATTLE spec (or None)
    md_force_fn: Callable        # MD path (possibly stateful cell kernel)
    minimize_force_fn: Optional[Callable]  # FULL-system kernel, or None
    nonbonded: str               # resolved engine name


def resolve_nonbonded(
    nonbonded: str, n_atoms: int, *, require_cells: bool = False,
    triclinic: bool = False,
) -> str:
    """Resolve "auto" and validate. The dense sweep streams (N, N)
    exclusion matrices — past a few thousand atoms the O(N) cell kernel
    wins on both compute and memory. ``require_cells`` (NPT: the
    barostat's dynamic box only exists in the cell engine) forces the
    cell path regardless of size; so does ``triclinic`` (the dense
    Pallas sweep does per-axis minimum image on the box diagonal and
    would silently corrupt tilted-cell forces)."""
    if nonbonded == "auto":
        return ("cells" if (n_atoms >= 3000 or require_cells or triclinic)
                else "dense")
    if nonbonded not in ("dense", "cells", "pme"):
        raise ValueError(
            f"nonbonded must be auto|dense|cells|pme, got {nonbonded!r}"
        )
    if nonbonded == "dense" and triclinic:
        raise ValueError(
            "nonbonded='dense' is orthorhombic-only (per-axis minimum "
            "image); triclinic cells need 'cells' or 'pme'"
        )
    return nonbonded


def compose_bias(force_fn: Callable, bias_fn: Callable) -> Callable:
    """Wrap ``force_fn(x) -> (e, f)`` so energies AND forces include the
    CV bias (force = -grad of the bias energy), preserving the cell
    kernel's stateful/batched entries (init_state / apply /
    init_state_batched / apply_batched) used by the skin-amortized
    paths. Single source for run_segment AND the REMD driver — the
    force/bias composition rule must not drift between entry points."""

    def wrapped(x):
        e, f = force_fn(x)
        be, bg = jax.value_and_grad(bias_fn)(x)
        return e + be, f - bg

    if hasattr(force_fn, "init_state"):
        def _apply(x, st):
            e, f, st = force_fn.apply(x, st)
            be, bg = jax.value_and_grad(bias_fn)(x)
            return e + be, f - bg, st

        wrapped.init_state = force_fn.init_state
        wrapped.apply = _apply
    if hasattr(force_fn, "init_state_batched"):
        def _apply_batched(xs, st):
            e_b, f_b, st = force_fn.apply_batched(xs, st)
            be_b, bg_b = jax.vmap(jax.value_and_grad(bias_fn))(xs)
            return e_b + be_b, f_b - bg_b, st

        wrapped.init_state_batched = force_fn.init_state_batched
        wrapped.apply_batched = _apply_batched
    return wrapped


@dataclasses.dataclass
class ImplicitSetup:
    """Everything an implicit-solvent driver needs, built consistently."""

    system: System               # full system (stiff X-H bonds kept)
    md_system: System            # constrained bonded terms stripped
    positions: jax.Array
    constraints: object          # SHAKE/RATTLE spec (or None)
    force_fn: Optional[Callable]  # None = let run_md self-build (dense,
    #                              unconstrained — keeps bias_fn foldable)
    force_path: str              # resolved "dense" | "pair_kernel"


def build_implicit_setup(
    structure,
    *,
    implicit_solvent: bool = True,
    gb_model: str = "gbn2",
    constraints: Optional[str] = None,
    force_path: str = "auto",
    tile: int = 256,
) -> ImplicitSetup:
    """Build the implicit-solvent setup: system, X-H constraints, and the
    resolved force path. SINGLE source of the auto force-path rule for
    ``run_segment`` AND ``run_replica_exchange`` (the two inline copies of
    the >600-atom threshold had already begun to drift — advisor round 4).

    Auto rule: the tiled Pallas pair kernel on TPU past ~600 atoms
    (protein scale, where the dense XLA sweep loses), the analytic dense
    path below. The rule is deliberately identical for constrained and
    unconstrained callers — both kernels are parity-tested against the
    same oracles, and entry points agreeing on the force path matters
    more than freezing an accidental historical difference.
    """
    if constraints not in (None, "none", "hbonds"):
        raise ValueError(
            f"constraints must be None|'none'|'hbonds', got {constraints!r}"
        )
    system, positions = build_system(
        structure, implicit_solvent=implicit_solvent, gb_model=gb_model
    )

    # constraints="hbonds": SHAKE/RATTLE every X-H bond (OpenMM HBonds).
    # MD forces drop the constrained bond terms (createSystem semantics);
    # minimization keeps the FULL system (handled by callers).
    cspec = None
    md_system = system
    if constraints == "hbonds":
        from .constraints import build_h_constraints, strip_constrained_bonded

        cspec = build_h_constraints(system)
        if cspec is not None:
            md_system = strip_constrained_bonded(system)

    if force_path == "auto":
        force_path = (
            "pair_kernel"
            if system.n_atoms > 600 and jax.default_backend() == "tpu"
            else "dense"
        )
    if force_path == "pair_kernel":
        from .pallas_pair import build_pair_force_fn

        # interpret mode lets the kernel run on non-TPU backends (tests)
        force_fn = build_pair_force_fn(
            md_system, tile=tile, interpret=jax.default_backend() != "tpu"
        )
    elif force_path == "dense":
        if cspec is None:
            force_fn = None  # run_md builds the analytic dense path
        else:
            from .integrate import make_force_fn

            force_fn = make_force_fn(md_system, None, analytic=True)
    else:
        raise ValueError(
            f"force_path must be auto|dense|pair_kernel, got {force_path!r}"
        )
    return ImplicitSetup(
        system=system, md_system=md_system, positions=positions,
        constraints=cspec, force_fn=force_fn, force_path=force_path,
    )


def build_explicit_setup(
    structure,
    *,
    box: Optional[Tuple[float, float, float]] = None,
    tilt: Optional[Tuple[float, float, float]] = None,
    cutoff: float = 0.9,
    switch_distance: Optional[float] = None,
    nonbonded: str = "auto",
    require_cells: bool = False,
    dispersion_correction: bool = False,
    build_minimize_fn: bool = True,
    interpret: Optional[bool] = None,
    pme_precise: bool = False,
) -> ExplicitSetup:
    """Build the full explicit-solvent setup from a solvated structure.

    ``box`` overrides the structure's CRYST1 (resume paths carry the
    evolved box); ``build_minimize_fn=False`` skips the FULL-system
    kernel's grid/exclusion setup entirely (resume paths never
    minimize). The minimize fn aliases the MD fn when stripping was a
    no-op (no constraints), so nothing is built twice."""
    system, positions = build_system(
        structure, box=box if box is not None else structure.box,
        tilt=(tilt if tilt is not None
              else getattr(structure, "tilt", None)),
        cutoff=cutoff,
        switch_distance=switch_distance,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nonbonded = resolve_nonbonded(
        nonbonded, system.n_atoms, require_cells=require_cells,
        triclinic=system.tilt is not None,
    )
    if pme_precise and nonbonded != "pme":
        raise ValueError(
            "pme_precise is the PME reciprocal path's knob; this system "
            f"resolved to nonbonded='{nonbonded}' (no reciprocal mesh) — "
            "request nonbonded='pme' or drop pme_precise"
        )

    from .constraints import build_h_constraints, strip_constrained_bonded

    constraints = build_h_constraints(system)
    # MD forces drop bonded terms the constraints replace (OpenMM
    # createSystem semantics); minimization keeps the FULL system —
    # unconstrained relaxation needs the stiff X-H bonds
    md_system = (strip_constrained_bonded(system)
                 if constraints is not None else system)

    if nonbonded == "dense":
        if dispersion_correction:
            raise ValueError(
                "dispersion_correction (NPT) needs the cell-list engine "
                "(nonbonded='cells' or 'pme'), not 'dense'"
            )
        from .pallas_periodic import build_periodic_force_fn

        def _build(sys_):
            return build_periodic_force_fn(sys_, interpret=interpret)
    else:
        from .pallas_cells import build_cell_force_fn

        elec = "pme" if nonbonded == "pme" else "rf"

        def _build(sys_):
            return build_cell_force_fn(
                sys_, interpret=interpret, electrostatics=elec,
                dispersion_correction=dispersion_correction,
                pme_precise=pme_precise,
            )

    md_force_fn = _build(md_system)
    minimize_force_fn = None
    if build_minimize_fn:
        minimize_force_fn = (md_force_fn if md_system is system
                             else _build(system))
    return ExplicitSetup(
        system=system, md_system=md_system, positions=positions,
        constraints=constraints, md_force_fn=md_force_fn,
        minimize_force_fn=minimize_force_fn, nonbonded=nonbonded,
    )


__all__ = [
    "ExplicitSetup", "ImplicitSetup", "build_explicit_setup",
    "build_implicit_setup", "compose_bias", "is_explicit_solvent",
    "resolve_nonbonded",
]
