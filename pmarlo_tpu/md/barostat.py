"""Monte-Carlo barostat: constant-pressure (NPT) sampling.

TPU-native equivalent of OpenMM's ``MonteCarloBarostat``. The reference
runs NVT segments itself but leans on its OpenMM dependency for
pressure control when equilibrating solvated boxes (the System built at
/root/reference/src/pmarlo/protein/protein.py:733 is the object users
attach a barostat to); this module supplies that capability first-party
so density equilibration of explicit-solvent systems needs no external
engine.

Mechanism (isotropic MC volume moves, Frenkel & Smit ch. 5.4 /
OpenMM semantics):

* every ``interval`` MD steps, propose ``V' = V + dV`` with
  ``dV ~ U(-w, w)``;
* scale molecule CENTERS by ``s = (V'/V)^(1/3)`` — molecules translate
  rigidly, so bond lengths, angles, and SHAKE/RATTLE-constrained
  geometries stay exactly satisfied and no velocity change is needed;
* accept with ``min(1, exp(-[dU + P dV - N_mol kT ln(V'/V)] / kT))``;
* the proposal width self-tunes toward ~50% acceptance (OpenMM's rule:
  every 10 attempts, shrink 10% when acceptance < 0.25, grow 10% when
  > 0.75, clamped to 30% of the current volume).

Everything — the MD chunks between moves, the move itself, the width
adaptation — compiles into ONE ``lax.scan`` program: the box rides the
scan carry as a traced (3,) array and the cell kernel re-derives cell
sizes / ghost shifts / PME influence from it (md/pallas_cells.py
``dynamic`` entry points). The grid SHAPE stays static; a move that
shrank a cell edge below the cutoff poisons the energy with NaN rather
than silently dropping pairs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
from .integrate import MDState, instantaneous_temperature, langevin_step
from .system import System

#: 1 bar in kJ/mol/nm^3 (1e5 J/m^3 * 1e-27 m^3/nm^3 * N_A / 1000)
BAR_TO_KJ_PER_MOL_NM3 = 0.06022140760
#: 1 amu/nm^3 in g/cm^3
AMU_PER_NM3_TO_G_PER_CM3 = 1.66053906660e-3


def molecule_ids(system: System) -> np.ndarray:
    """Per-atom molecule id (0..n_mols-1) from bond connectivity
    (host-side union-find over ``bond_idx``; rigid waters keep their
    O-H bonds in the UNSTRIPPED system, so pass that one)."""
    n = system.n_atoms
    parent = np.arange(n)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    bonds = np.asarray(system.bond_idx).reshape(-1, 2)
    for a, b in bonds:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    roots = np.array([find(i) for i in range(n)])
    _, ids = np.unique(roots, return_inverse=True)
    return ids.astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BarostatState:
    """Carry of the MC barostat inside the NPT scan."""

    box: jax.Array          # (3,) nm
    key: jax.Array          # PRNG key for proposals/acceptance
    dv: jax.Array           # proposal half-width (nm^3)
    n_attempted: jax.Array  # i32 total attempts
    n_accepted: jax.Array   # i32 total accepts
    win_attempted: jax.Array  # i32 attempts in the current tuning window
    win_accepted: jax.Array   # i32 accepts in the current tuning window


def init_barostat(
    box: Tuple[float, float, float] | jax.Array,
    key: jax.Array,
    dv_initial: Optional[float] = None,
) -> BarostatState:
    b = jnp.asarray(box, jnp.float32)
    v0 = float(b[0] * b[1] * b[2])
    dv = float(dv_initial) if dv_initial is not None else 0.01 * v0
    z = jnp.asarray(0, jnp.int32)
    return BarostatState(
        box=b, key=key, dv=jnp.asarray(dv, jnp.float32),
        n_attempted=z, n_accepted=z, win_attempted=z, win_accepted=z,
    )


def scale_positions(
    x: jax.Array, s: jax.Array, mol_id: jax.Array, masses: jax.Array,
    n_mols: int,
) -> jax.Array:
    """Isotropic volume-move position update: translate every molecule
    rigidly so its mass-weighted COM scales by ``s`` — intramolecular
    geometry (bond lengths, SHAKE-constrained waters) is exactly
    preserved."""
    mol_id = jnp.asarray(mol_id, jnp.int32)
    m = jnp.asarray(masses, x.dtype)
    mol_mass = jax.ops.segment_sum(m, mol_id, num_segments=n_mols)
    wx = m[:, None] * x
    com = jax.ops.segment_sum(wx, mol_id, num_segments=n_mols)
    com = com / mol_mass[:, None]
    return x + (s - 1.0) * com[mol_id]


def make_volume_move(
    energy_fn: Callable[[jax.Array, jax.Array], jax.Array],
    mol_id: jax.Array,
    masses: jax.Array,
    n_mols: int,
    *,
    pressure_bar: float,
    temperature_K: float,
):
    """Build the jittable MC volume move.

    ``energy_fn(x, box) -> potential energy`` at the given box (the
    cell force fn's ``dynamic`` entry returns (e, f); wrap it).
    Returns ``move(x, bstate) -> (x', bstate', accepted, energy)`` with
    ``energy`` the potential AFTER the accept/reject decision, so a
    reported frame can pair (positions, box, E) consistently."""
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * float(temperature_K)
    P = BAR_TO_KJ_PER_MOL_NM3 * float(pressure_bar)

    def move(x, bstate: BarostatState):
        key, k_dv, k_acc = jax.random.split(bstate.key, 3)
        box = bstate.box
        v0 = box[0] * box[1] * box[2]
        dv = jax.random.uniform(k_dv, (), jnp.float32, -1.0, 1.0) * bstate.dv
        v1 = jnp.maximum(v0 + dv, 0.1 * v0)
        s = (v1 / v0) ** (1.0 / 3.0)
        box1 = box * s
        x1 = scale_positions(x, s, mol_id, masses, n_mols)

        e0 = energy_fn(x, box)
        e1 = energy_fn(x1, box1)
        # NaN energies (cutoff cover broken, overflow) must auto-reject,
        # not propagate: w = NaN -> exp comparison is False -> reject
        w = (e1 - e0) + P * (v1 - v0) - n_mols * kT * jnp.log(v1 / v0)
        u = jax.random.uniform(k_acc, (), jnp.float32)
        accepted = u < jnp.exp(jnp.minimum(-w / kT, 0.0))

        x_new = jnp.where(accepted, x1, x)
        box_new = jnp.where(accepted, box1, box)

        # OpenMM-style width adaptation every 10 attempts
        wa = bstate.win_attempted + 1
        wacc = bstate.win_accepted + accepted.astype(jnp.int32)
        tune = wa >= 10
        frac = wacc.astype(jnp.float32) / jnp.maximum(
            wa.astype(jnp.float32), 1.0)
        dv_t = jnp.where(frac < 0.25, bstate.dv / 1.1,
                         jnp.where(frac > 0.75, bstate.dv * 1.1,
                                   bstate.dv))
        v_now = box_new[0] * box_new[1] * box_new[2]
        dv_new = jnp.where(tune, jnp.clip(dv_t, 1e-6, 0.3 * v_now),
                           bstate.dv)
        new_state = BarostatState(
            box=box_new, key=key, dv=dv_new,
            n_attempted=bstate.n_attempted + 1,
            n_accepted=bstate.n_accepted + accepted.astype(jnp.int32),
            win_attempted=jnp.where(tune, 0, wa),
            win_accepted=jnp.where(tune, 0, wacc),
        )
        e_now = jnp.where(accepted, e1, e0)
        return x_new, new_state, accepted, e_now

    return move


#: jitted-scan cache (same rationale as integrate._RUN_MD_CACHE: fresh
#: closures per call would retrace the whole nested-scan program)
_RUN_NPT_CACHE: dict = {}


def run_npt(
    system: System,
    state: MDState,
    *,
    n_steps: int,
    dt: float,
    friction: float,
    temperature_K: float,
    pressure_bar: float = 1.0,
    barostat_interval: int = 25,
    report_interval: int = 100,
    force_fn,
    constraints=None,
    full_system: Optional[System] = None,
    seed: int = 0,
    barostat_state: Optional[BarostatState] = None,
    bias_fn: Optional[Callable] = None,
) -> Tuple[MDState, BarostatState, dict]:
    """NPT MD: Langevin (NVT) chunks punctuated by MC volume moves.

    ``bias_fn(x) -> scalar`` composes a CV bias into constant-pressure
    sampling: the Langevin chunks run on the biased force
    (``f - grad(bias)``) and the volume move's acceptance uses the
    biased potential — the MC ΔU must include the bias's response to
    the molecule-rigid COM scaling, or the sampled (V, x) distribution
    is not exp(-β[U + U_bias + PV]). Composition rule identical to the
    NVT path (setup.compose_bias).

    ``barostat_state``: pass the BarostatState returned by a previous
    ``run_npt`` call to CONTINUE a run — keeps the evolved box, the
    self-tuned proposal width, and the move PRNG stream. Without it the
    barostat re-initializes from ``system.box``, which is wrong for
    positions that already equilibrated to a different volume.

    ``force_fn`` must be a cell force fn (md/pallas_cells.py
    build_cell_force_fn) — its ``dynamic``/``init_state_dynamic``/
    ``apply_dynamic`` entries thread the traced box. ``full_system``
    (default ``system``) supplies bond connectivity for molecule
    grouping — pass the unstripped system when MD forces run on
    ``strip_constrained_bonded`` output.

    Returns (final MDState, final BarostatState, report) where report
    carries positions (F, N, 3), box (F, 3), density_g_cm3 (F,),
    potential_energy (F,), temperature (F,).
    """
    for name in ("dynamic", "init_state_dynamic", "apply_dynamic"):
        if not hasattr(force_fn, name):
            raise ValueError(
                "run_npt needs a cell-list force fn with dynamic-box "
                f"support (missing .{name}); build it via "
                "build_cell_force_fn"
            )
    if system.box is None:
        raise ValueError("run_npt needs a periodic system (system.box)")
    if n_steps % report_interval != 0:
        raise ValueError("n_steps must be a multiple of report_interval")
    if report_interval % barostat_interval != 0:
        raise ValueError(
            "report_interval must be a multiple of barostat_interval"
        )
    conn = full_system if full_system is not None else system
    mol = molecule_ids(conn)
    n_mols = int(mol.max()) + 1
    total_mass = float(np.asarray(system.masses).sum())

    if bias_fn is not None:
        def _move_energy(x, b):
            return force_fn.dynamic(x, b)[0] + bias_fn(x)

        def _apply_dynamic(x, fs, box):
            e, f, fs2 = force_fn.apply_dynamic(x, fs, box)
            be, bg = jax.value_and_grad(bias_fn)(x)
            return e + be, f - bg, fs2
    else:
        def _move_energy(x, b):
            return force_fn.dynamic(x, b)[0]

        _apply_dynamic = force_fn.apply_dynamic

    move = make_volume_move(
        _move_energy,
        mol, system.masses, n_mols,
        pressure_bar=pressure_bar, temperature_K=temperature_K,
    )

    if constraints is not None:
        from .constraints import n_constraints as _nc

        n_con = _nc(constraints)
    else:
        n_con = 0

    moves_per_chunk = report_interval // barostat_interval
    n_chunks = n_steps // report_interval

    cache_key = (
        id(system), id(force_fn), id(constraints), id(conn), id(bias_fn),
        n_steps, dt,
        friction, float(temperature_K), float(pressure_bar),
        barostat_interval, report_interval,
    )
    if cache_key not in _RUN_NPT_CACHE:
        if len(_RUN_NPT_CACHE) > 64:
            _RUN_NPT_CACHE.clear()

        def md_step(carry, _):
            st, box, fstate = carry
            new_st, energy, fstate = langevin_step(
                system, st, dt=dt, friction=friction,
                temperature_K=temperature_K,
                force_fn=lambda x, fs: _apply_dynamic(x, fs, box),
                constraints=constraints, force_state=fstate,
            )
            return (new_st, box, fstate), energy

        def md_plus_move(carry, _):
            st, fstate, bstate = carry
            (st, _, fstate), energies = jax.lax.scan(
                md_step, (st, bstate.box, fstate), None,
                length=barostat_interval,
            )
            x_new, bstate, accepted, e_now = move(st.positions, bstate)
            # rebin under the (possibly) new box: wrapped reference
            # coords and ghost shifts must agree on the period
            fstate = jax.lax.cond(
                accepted,
                lambda _: force_fn.init_state_dynamic(x_new, bstate.box),
                lambda fs: fs, fstate,
            )
            st = dataclasses.replace(st, positions=x_new)
            # report the POST-move energy: a frame's (positions, box, E)
            # must describe one consistent configuration, not the
            # pre-move energy next to the post-move box
            del energies
            return (st, fstate, bstate), e_now

        def chunk(carry, _):
            (st, fstate, bstate), energies = jax.lax.scan(
                md_plus_move, carry, None, length=moves_per_chunk
            )
            v = bstate.box[0] * bstate.box[1] * bstate.box[2]
            # synchronize velocities with the trailing half-kick before
            # reporting T — same convention as run_md's frames, so NPT
            # and NVT segments report comparable temperatures (the raw
            # folded-leapfrog velocity is half a kick behind)
            _e, f_now, _fs = _apply_dynamic(
                st.positions, fstate, bstate.box
            )
            v_sync = (st.velocities
                      + 0.5 * dt * f_now
                      * jnp.where(system.masses > 0.0,
                                  1.0 / system.masses,
                                  0.0)[:, None])
            if constraints is not None:
                from .constraints import rattle

                v_sync = rattle(constraints, v_sync, st.positions)
            frame = {
                "positions": st.positions,
                "box": bstate.box,
                "density_g_cm3": AMU_PER_NM3_TO_G_PER_CM3
                * total_mass / v,
                "potential_energy": energies[-1],
                "temperature": instantaneous_temperature(
                    system, v_sync, n_con
                ),
            }
            return (st, fstate, bstate), frame

        @jax.jit
        def scan_fn(st, bstate):
            fstate = force_fn.init_state_dynamic(st.positions, bstate.box)
            (st, _, bstate), frames = jax.lax.scan(
                chunk, (st, fstate, bstate), None, length=n_chunks
            )
            return st, bstate, frames

        # keep conn/bias alive alongside the program: the closure
        # captures only derived objects, so without this a GC'd
        # full_system's (or bias_fn's) id could be recycled by a
        # DIFFERENT object and silently hit this entry
        _RUN_NPT_CACHE[cache_key] = (scan_fn, conn, bias_fn)

    if barostat_state is None:
        barostat_state = init_barostat(system.box, jax.random.PRNGKey(seed))
    final, bstate, frames = _RUN_NPT_CACHE[cache_key][0](
        state, barostat_state
    )
    return final, bstate, frames


__all__ = [
    "BAR_TO_KJ_PER_MOL_NM3", "BarostatState", "init_barostat",
    "make_volume_move", "molecule_ids", "run_npt", "scale_positions",
]
