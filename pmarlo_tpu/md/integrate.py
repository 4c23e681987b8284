"""Langevin-middle (BAOAB) integration as a scannable JAX step.

TPU-native replacement for OpenMM's ``LangevinMiddleIntegrator`` +
``simulation.step(n)`` hot loop (reference src/pmarlo/simulation/
__init__.py:73-109). The whole segment — force evals, O-step noise,
reporting strides — compiles into one XLA program via ``lax.scan``;
replicas batch with ``vmap`` (see remd/).

Constraints: OpenMM runs HBonds-constrained 2 fs steps. Here the default is
*unconstrained* BAOAB with HMR 3 amu, which slows X-H vibrational periods
enough for stable 2 fs integration without SHAKE's sequential iteration
(which maps poorly onto wide vector units). The tradeoff is documented in
SURVEY.md section 7 "hard parts".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
from .forces import potential_energy
from .system import System


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MDState:
    """Dynamic state of one (or a vmapped batch of) simulation(s)."""

    positions: jax.Array   # (N, 3) nm
    velocities: jax.Array  # (N, 3) nm/ps
    key: jax.Array         # PRNG key
    step: jax.Array        # int32 step counter


def initialize_velocities(
    system: System, key: jax.Array, temperature_K: float | jax.Array
) -> jax.Array:
    """Maxwell-Boltzmann velocities at T (nm/ps)."""
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * temperature_K
    # massless virtual sites (TIP4P-Ew M) carry no velocity
    inv_m = jnp.where(system.masses > 0.0, 1.0 / system.masses, 0.0)
    sigma = jnp.sqrt(kT * inv_m)[:, None]
    noise = jax.random.normal(key, (system.n_atoms, 3), dtype=system.masses.dtype)
    return sigma * noise


def kinetic_energy(system: System, velocities: jax.Array) -> jax.Array:
    return 0.5 * jnp.sum(system.masses[:, None] * velocities**2)


def instantaneous_temperature(
    system: System, velocities: jax.Array, n_constraints: int = 0,
    remove_com: bool = False,
) -> jax.Array:
    """Kinetic temperature. ``n_constraints`` removes constrained dof
    (rigid waters/H bonds) so constrained runs report the true T.

    ``remove_com`` subtracts the 3 center-of-mass dof. Langevin runs
    (friction > 0) must NOT: the O-step noise re-thermalizes the COM
    within ~1/friction (nothing removes COM motion during the run), so
    steady-state KE is (3N - n_con)/2 kT; subtracting 3 would bias
    reported T high by 3N/(3N-3) — ~5% on a dipeptide. NVE runs
    (friction == 0) MUST: thermalize() zeroes the COM momentum and
    velocity Verlet conserves it exactly (internal forces sum to zero),
    so only 3N - 3 - n_con dof carry kinetic energy. OpenMM draws the
    same line via its CMMotionRemover."""
    from .vsites import n_vsites

    # massless virtual sites carry no kinetic dof
    n_dof = max(
        3 * (system.n_atoms - n_vsites(system)) - int(n_constraints)
        - (3 if remove_com else 0), 1
    )
    return 2.0 * kinetic_energy(system, velocities) / (
        n_dof * BOLTZMANN_CONSTANT_KJ_PER_MOL
    )


def remove_com_motion(system: System, velocities: jax.Array) -> jax.Array:
    total_mass = jnp.sum(system.masses)
    p = jnp.sum(system.masses[:, None] * velocities, axis=0)
    return velocities - (p / total_mass)[None, :]


def make_force_fn(
    system: System,
    bias_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    analytic: bool = True,
):
    """Build ``force_fn(x) -> (energy, forces)``.

    ``analytic=True`` uses the manual-derivative dense path
    (md/analytic.py) — ~2x fewer ops than forward+reverse autodiff and the
    same math the Pallas kernel runs; the bias term (if any) is small and
    stays on autodiff.
    """
    from .vsites import wrap_force_fn

    if analytic:
        from .analytic import energy_and_forces, make_dense_params

        dense = make_dense_params(system)

        def force_fn(x):
            e, f = energy_and_forces(dense, x)
            if bias_fn is not None:
                be, bg = jax.value_and_grad(bias_fn)(x)
                e = e + be
                f = f - bg
            return e, f

        return wrap_force_fn(force_fn, system)

    def force_fn(x):
        e, g = jax.value_and_grad(
            lambda p: potential_energy(system, p, bias_fn)
        )(x)
        return e, -g

    return wrap_force_fn(force_fn, system)


def langevin_step(
    system: System,
    state: MDState,
    *,
    dt: float,
    friction: float,
    temperature_K: float | jax.Array,
    bias_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    force_fn: Optional[Callable] = None,
    constraints=None,
    force_state=None,
) -> Tuple[MDState, jax.Array]:
    """One BAOAB step. Returns (new_state, potential_energy).

    With ``force_state`` (a stateful force fn's carry, e.g. the cell
    kernel's skin-amortized ``NeighborState``), ``force_fn`` must have
    the stateful signature ``fn(x, state) -> (energy, forces, state)``
    and the return becomes ``(new_state, energy, new_force_state)``.

    With ``constraints`` (md.constraints.ConstraintSpec) the step runs
    g-BAOAB-style: SHAKE after each position half-step, RATTLE after each
    velocity update — matching OpenMM's HBonds protocol.

    Leapfrog (folded) form of BAOAB, identical to OpenMM's
    ``LangevinMiddleIntegrator``: the trailing B(dt/2) of one step and the
    leading B(dt/2) of the next both evaluate the force at the same x, so
    they merge into ONE full-dt kick — B(dt): v += dt*f/m ; A(dt/2) ; O ;
    A(dt/2) — one force evaluation per step. The kick MUST be the full dt
    (a dt/2 kick here would integrate F/2 and sample exp(-U/2kT): the
    configurational temperature doubles — regression-tested via the
    harmonic-oscillator variance check in tests/unit/test_integrator_stats.py).
    Reported velocities are offset by half a kick, as in OpenMM middle.
    """
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * temperature_K
    m = system.masses[:, None]
    # massless virtual sites get no kick, no noise, no drift; their
    # positions are re-derived from parents at the end of the step
    inv_m = jnp.where(m > 0.0, 1.0 / m, 0.0)

    if force_fn is not None and bias_fn is not None:
        raise ValueError(
            "pass either force_fn or bias_fn, not both — a given force_fn "
            "is used as-is and the bias would be silently dropped"
        )
    if force_state is not None:
        energy, f, force_state = force_fn(state.positions, force_state)
    elif force_fn is not None:
        energy, f = force_fn(state.positions)
    else:
        if getattr(system, "vsite_idx", None) is not None:
            # compose the site expansion into the energy: jax.grad
            # through the linear map IS the exact force spread
            from .vsites import vsite_positions as _vp

            def _e(x):
                return potential_energy(
                    system,
                    _vp(x, system.vsite_idx, system.vsite_weights,
                        getattr(system, "vsite_kind", None)),
                    bias_fn,
                )
        else:
            def _e(x):
                return potential_energy(system, x, bias_fn)
        energy, grad = jax.value_and_grad(_e)(state.positions)
        f = -grad

    v = state.velocities + dt * f * inv_m
    if constraints is not None:
        from .constraints import rattle, shake

        v = rattle(constraints, v, state.positions)
    x = state.positions + 0.5 * dt * v
    if constraints is not None:
        # g-BAOAB (Leimkuhler-Matthews) ordering: SHAKE the drifted
        # positions, fold the correction into v, then RATTLE — the shake
        # correction is along reference bond directions (normal to the
        # manifold), and leaving it in v pumps heat: the zero-force
        # thermostat test read ~400 K instead of 300 K without the
        # trailing RATTLEs and blew up at 2 fs.
        x_c = shake(constraints, x, state.positions)
        v = v + (x_c - x) / (0.5 * dt)
        x = x_c
        v = rattle(constraints, v, x)

    c1 = jnp.exp(-friction * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * kT * inv_m)
    key, sub = jax.random.split(state.key)
    v = c1 * v + c2 * jax.random.normal(sub, v.shape, dtype=v.dtype)
    if constraints is not None:
        v = rattle(constraints, v, x)

    x_pre = x
    x = x + 0.5 * dt * v
    if constraints is not None:
        x_c = shake(constraints, x, x_pre)
        v = v + (x_c - x) / (0.5 * dt)
        x = x_c
        v = rattle(constraints, v, x)
    if getattr(system, "vsite_idx", None) is not None:
        from .vsites import vsite_positions

        x = vsite_positions(x, system.vsite_idx, system.vsite_weights,
                            getattr(system, "vsite_kind", None))
    # trailing B uses the force at the *new* positions in strict BAOAB; we
    # fold it into the next step's leading B (standard leapfrog-style fusion,
    # identical long-run sampling, one force eval per step).
    new_state = MDState(positions=x, velocities=v, key=key, step=state.step + 1)
    if force_state is not None:
        return new_state, energy, force_state
    return new_state, energy


#: jitted-scan cache for run_md: building the scan closures fresh on every
#: call RETRACES AND RECOMPILES the whole program (an 80 s recompile per
#: call for the tiled pair kernel masqueraded as 160 ms/step "steady
#: state"). Keyed by the identities/statics that change the program.
_RUN_MD_CACHE: dict = {}


def run_md(
    system: System,
    state: MDState,
    *,
    n_steps: int,
    dt: float,
    friction: float,
    temperature_K: float | jax.Array,
    report_interval: int = 100,
    bias_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    force_fn: Optional[Callable] = None,
    constraints=None,
) -> Tuple[MDState, dict]:
    """Run ``n_steps`` and collect frames every ``report_interval`` steps.

    Compiles to a single nested-scan XLA program: the inner scan advances
    ``report_interval`` steps, the outer scan emits one frame per chunk.
    Returns (final_state, report) where report has device arrays:
    positions (F, N, 3), potential_energy (F,), temperature (F,).

    Repeat calls with the same ``force_fn`` object (or the same system
    when force_fn is None) and the same statics reuse one compiled
    executable; temperature rides as a traced argument.
    """
    if n_steps % report_interval != 0:
        raise ValueError(
            f"n_steps {n_steps} must be a multiple of report_interval {report_interval}"
        )
    n_chunks = n_steps // report_interval

    if force_fn is not None and bias_fn is not None:
        # refusing beats silence: folding bias_fn into a given force_fn
        # here would double-count for callers that pre-compose (the
        # simulation/REMD paths), and ignoring it runs silently UNBIASED
        raise ValueError(
            "pass either force_fn or bias_fn, not both — compose the bias "
            "into the force_fn (energy + bias, forces - grad(bias)) as "
            "md/simulation.py and remd/remd.py:_compose_bias do"
        )
    self_built = force_fn is None
    if self_built:
        force_fn = make_force_fn(system, bias_fn, analytic=True)

    key = (
        # a self-built closure is fresh every call: keying on its id
        # would defeat the cache and recompile every segment
        id(system) if self_built else id(force_fn),
        self_built, id(bias_fn), id(constraints),
        n_steps, dt, friction, report_interval,
    )
    if key not in _RUN_MD_CACHE:
        if len(_RUN_MD_CACHE) > 64:
            _RUN_MD_CACHE.clear()

        if constraints is not None:
            from .constraints import n_constraints as _nc

            n_con = _nc(constraints)
        else:
            n_con = 0

        # stateful force fns (cell kernel with a skin: init_state/apply)
        # thread their neighbor state through the scan carry, so the
        # binning pass runs only when an atom outruns the skin
        stateful = hasattr(force_fn, "init_state")
        step_force = force_fn.apply if stateful else force_fn

        def inner(carry, _):
            st, temp, fstate = carry
            if stateful:
                new_state, energy, fstate = langevin_step(
                    system, st, dt=dt, friction=friction,
                    temperature_K=temp, force_fn=step_force,
                    constraints=constraints, force_state=fstate,
                )
            else:
                new_state, energy = langevin_step(
                    system, st, dt=dt, friction=friction,
                    temperature_K=temp, force_fn=step_force,
                    constraints=constraints,
                )
            return (new_state, temp, fstate), energy

        def outer(carry, _):
            (new_state, temp, fstate), _energies = jax.lax.scan(
                inner, carry, None, length=report_interval
            )
            # evaluate PE at the REPORTED positions: the in-step energy
            # (_energies[-1]) is computed at the kick, one position
            # update behind, which would pair PE(x_{n-1}) with KE(v_n)
            # and pollute per-frame total-energy traces (NVE guardrail)
            if stateful:
                e_now, f_now, fstate = step_force(new_state.positions,
                                                  fstate)
            else:
                e_now, f_now = step_force(new_state.positions)
            # the folded-leapfrog state velocity lacks the trailing
            # half-kick (langevin_step docstring); shift it so the frame
            # is a synchronized (x_n, v_n) phase point — OpenMM reports
            # kinetic quantities from shifted velocities the same way
            v_sync = (new_state.velocities
                      + 0.5 * dt * f_now
                      * jnp.where(system.masses > 0.0,
                                  1.0 / system.masses,
                                  0.0)[:, None])
            if constraints is not None:
                from .constraints import rattle

                v_sync = rattle(constraints, v_sync, new_state.positions)
            frame = {
                "positions": new_state.positions,
                "potential_energy": e_now,
                # friction == 0 is NVE: COM momentum is conserved at the
                # zero thermalize() set, so the COM dof carry no KE
                "temperature": instantaneous_temperature(
                    system, v_sync, n_con, remove_com=(friction == 0.0)
                ),
            }
            return (new_state, temp, fstate), frame

        @jax.jit
        def scan_fn(st, temp):
            fstate = (force_fn.init_state(st.positions)
                      if stateful else jnp.zeros(()))
            (final, _, _), frames = jax.lax.scan(
                outer, (st, temp, fstate), None, length=n_chunks
            )
            return final, frames

        _RUN_MD_CACHE[key] = scan_fn

    final_state, frames = _RUN_MD_CACHE[key](
        state, jnp.asarray(temperature_K, dtype=state.positions.dtype)
    )

    # tile-culled kernels (pallas_pair gb_cutoff) NaN-poison evaluations
    # whose tile neighbor list overflowed its static width K; surface
    # that to the host at segment granularity so long runs fail loudly
    # instead of writing NaN frames into trajectories/checkpoints
    check = getattr(force_fn, "check_overflow", None)
    if check is not None:
        pos = final_state.positions
        overflowed = bool(check(pos))
        if overflowed or not bool(jnp.all(jnp.isfinite(pos))):
            raise RuntimeError(
                "tile neighbor list overflow: atoms drifted far enough "
                "from the build geometry that a tile now has more "
                f"cutoff-range neighbor tiles than the list width K="
                f"{getattr(force_fn, 'tile_list_width', '?')} — this "
                "segment's outputs are NaN-poisoned and must be "
                "discarded. Rebuild the force fn with order_from=<last "
                "good positions> (fresh Morton order re-tightens the "
                "tiles and re-sizes K) and resume from the previous "
                "segment's state."
            )
    return final_state, frames


def thermalize(
    system: System,
    positions: jax.Array,
    key: jax.Array,
    temperature_K: float | jax.Array,
) -> MDState:
    """Fresh MDState with Maxwell-Boltzmann velocities (COM removed)."""
    key, sub = jax.random.split(key)
    v = initialize_velocities(system, sub, temperature_K)
    v = remove_com_motion(system, v)
    return MDState(
        positions=positions,
        velocities=v,
        key=key,
        step=jnp.asarray(0, dtype=jnp.int32),
    )


__all__ = [
    "MDState",
    "langevin_step",
    "run_md",
    "thermalize",
    "initialize_velocities",
    "kinetic_energy",
    "instantaneous_temperature",
    "remove_com_motion",
]
