"""Energy minimization: FIRE descent, fully jittable.

Replaces OpenMM's ``simulation.minimizeEnergy`` (reference
src/pmarlo/simulation/__init__.py:91). FIRE (fast inertial relaxation
engine) is branch-light — every update is a ``where`` over the power sign —
so it compiles to a single ``lax.scan`` with static iteration count, unlike
L-BFGS's data-dependent line searches.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .forces import potential_energy
from .system import System


def minimize_energy(
    system: System,
    positions: jax.Array,
    *,
    max_iterations: int = 500,
    dt_start: float = 1e-4,
    dt_max: float = 2e-3,
    bias_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    force_fn: Optional[Callable[[jax.Array], Tuple[jax.Array, jax.Array]]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """FIRE minimization. Returns (positions, final_energy).

    ``force_fn`` (x -> (energy, forces)), when given, replaces the dense
    ``potential_energy`` autodiff path — this is how solvated systems
    minimize through the tiled periodic Pallas kernel instead of
    materializing O(N^2) XLA matrices (ADVICE r2 #4). ``bias_fn`` composes
    on top of either path."""
    if force_fn is not None:
        if bias_fn is not None:
            def energy_fn(x):
                return force_fn(x)[0] + bias_fn(x)

            def neg_grad_fn(x):
                e, f = force_fn(x)
                return f - jax.grad(bias_fn)(x)
        else:
            energy_fn = lambda x: force_fn(x)[0]
            neg_grad_fn = lambda x: force_fn(x)[1]
    else:
        if getattr(system, "vsite_idx", None) is not None:
            # compose the virtual-site expansion into the energy: grad
            # through the linear map IS the exact force spread, and the
            # minimizer then never moves site rows off their parents
            from .vsites import vsite_positions as _vp

            def energy_fn(x):
                return potential_energy(
                    system,
                    _vp(x, system.vsite_idx, system.vsite_weights,
                        getattr(system, "vsite_kind", None)),
                    bias_fn,
                )
        else:
            energy_fn = lambda x: potential_energy(system, x, bias_fn)
        _grad = jax.grad(energy_fn)
        neg_grad_fn = lambda x: -_grad(x)

    f_inc, f_dec, alpha_start, f_alpha, n_min = 1.1, 0.5, 0.1, 0.99, 5

    def body(carry, _):
        x, v, dt, alpha, n_pos = carry
        f = neg_grad_fn(x)
        power = jnp.sum(f * v)
        f_norm = jnp.sqrt(jnp.sum(f * f)) + 1e-12
        v_norm = jnp.sqrt(jnp.sum(v * v))
        v_mixed = (1.0 - alpha) * v + alpha * (f / f_norm) * v_norm

        uphill = power < 0.0
        v_new = jnp.where(uphill, jnp.zeros_like(v), v_mixed)
        n_pos_new = jnp.where(uphill, 0, n_pos + 1)
        grow = jnp.logical_and(~uphill, n_pos_new > n_min)
        dt_new = jnp.where(
            uphill, dt * f_dec, jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt)
        )
        alpha_new = jnp.where(
            uphill, alpha_start, jnp.where(grow, alpha * f_alpha, alpha)
        )
        # semi-implicit Euler with force capped per-atom for robustness
        v_next = v_new + dt_new * f
        step_vec = dt_new * v_next
        max_disp = 0.01  # nm per iteration per atom
        norm = jnp.sqrt(jnp.sum(step_vec**2, axis=-1, keepdims=True)) + 1e-12
        step_vec = step_vec * jnp.minimum(1.0, max_disp / norm)
        x_new = x + step_vec
        return (x_new, v_next, dt_new, alpha_new, n_pos_new), None

    init = (
        positions,
        jnp.zeros_like(positions),
        jnp.asarray(dt_start, dtype=positions.dtype),
        jnp.asarray(alpha_start, dtype=positions.dtype),
        jnp.asarray(0, dtype=jnp.int32),
    )
    (x_final, *_), _ = jax.lax.scan(body, init, None, length=max_iterations)
    if getattr(system, "vsite_idx", None) is not None:
        # site rows saw zero net force during FIRE and are stale; hand
        # back parent-consistent coordinates
        from .vsites import vsite_positions as _vp_out

        x_final = _vp_out(x_final, system.vsite_idx, system.vsite_weights,
                          getattr(system, "vsite_kind", None))
    return x_final, energy_fn(x_final)


__all__ = ["minimize_energy"]
