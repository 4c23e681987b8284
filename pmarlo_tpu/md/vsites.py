"""Virtual interaction sites (massless particles on parent-defined positions).

The reference gets 4-site waters (TIP4P-Ew) and lipid virtual sites for
free through OpenMM's amber14 family (ForceField XMLs define
ThreeParticleAverageSite particles; the reference's solvation path is
/root/reference/src/pmarlo/protein/protein.py:334-373). This module is the
TPU-native equivalent: a virtual site is a LINEAR map of its parents'
positions, so the whole machinery is two fixed gather/scatter maps —

    expand:  x[site] := w0 x[p0] + w1 x[p1] + w2 x[p2]
    spread:  F[p_k] += w_k F[site];  F[site] := 0   (the exact J^T)

and for autodiff force paths even the spread is free: forces on physical
atoms are just ``jax.grad`` of E(expand(x)) — the same architectural
collapse the framework applies to CV biasing (SURVEY.md section 7).

Sites carry charge/LJ like any particle inside the nonbonded kernels; they
carry ZERO mass, so the integrator gives them no kick, no thermostat
noise, and no kinetic-energy dof (md/integrate.py masks 1/m and the dof
count), and re-applies ``expand`` after every position update.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def vsite_positions(x: jax.Array, idx: jax.Array, w: jax.Array) -> jax.Array:
    """Overwrite site rows with their parent-defined positions.

    ``idx`` (V, 4) int32 [site, p0, p1, p2]; ``w`` (V, 3) weights
    (ThreeParticleAverageSite: r_site = w0 r_p0 + w1 r_p1 + w2 r_p2).
    Differentiable — ``jax.grad`` through this IS the force spread."""
    site = idx[:, 0]
    r = (w[:, 0:1] * x[idx[:, 1]]
         + w[:, 1:2] * x[idx[:, 2]]
         + w[:, 2:3] * x[idx[:, 3]])
    return x.at[site].set(r)


def vsite_spread(f: jax.Array, idx: jax.Array, w: jax.Array) -> jax.Array:
    """Redistribute site forces onto parents (J^T of ``vsite_positions``)
    and zero the site rows — for HAND-WRITTEN force kernels whose output
    is not produced by autodiff through the expansion."""
    site = idx[:, 0]
    fs = f[site]
    f = f.at[site].set(0.0)
    f = f.at[idx[:, 1]].add(w[:, 0:1] * fs)
    f = f.at[idx[:, 2]].add(w[:, 1:2] * fs)
    f = f.at[idx[:, 3]].add(w[:, 2:3] * fs)
    return f


def wrap_force_fn(fn: Callable, system) -> Callable:
    """Make a force fn virtual-site-correct: re-derive site positions
    from parents before evaluating, spread site forces onto parents
    after. No-op (returns ``fn`` unchanged) when the system has no
    sites. Preserves the stateful/batched cell-kernel entries and any
    metadata attributes (pme_mesh_shape, check_overflow, ...), mirroring
    md/setup.py compose_bias."""
    idx = getattr(system, "vsite_idx", None)
    if idx is None or (hasattr(idx, "shape") and idx.shape[0] == 0):
        return fn
    w = system.vsite_weights

    def wrapped(x):
        xf = vsite_positions(x, idx, w)
        e, f = fn(xf)
        return e, vsite_spread(f, idx, w)

    if hasattr(fn, "init_state"):
        def _init(x):
            return fn.init_state(vsite_positions(x, idx, w))

        def _apply(x, st):
            e, f, st = fn.apply(vsite_positions(x, idx, w), st)
            return e, vsite_spread(f, idx, w), st

        wrapped.init_state = _init
        wrapped.apply = _apply
    if hasattr(fn, "init_state_batched"):
        vexp = jax.vmap(lambda xx: vsite_positions(xx, idx, w))
        vspr = jax.vmap(lambda ff: vsite_spread(ff, idx, w))

        def _init_b(xs):
            return fn.init_state_batched(vexp(xs))

        def _apply_b(xs, st):
            e_b, f_b, st = fn.apply_batched(vexp(xs), st)
            return e_b, vspr(f_b), st

        wrapped.init_state_batched = _init_b
        wrapped.apply_batched = _apply_b
    # metadata attributes ride along untouched
    for attr in ("pme_mesh_shape", "pme_order", "grid", "tile_list_width",
                 "electrostatics", "skin", "local_shapes"):
        if hasattr(fn, attr):
            setattr(wrapped, attr, getattr(fn, attr))
    if hasattr(fn, "check_overflow"):
        wrapped.check_overflow = (
            lambda x: fn.check_overflow(vsite_positions(x, idx, w))
        )
    if hasattr(fn, "dynamic"):
        def _dyn(x, box):
            e, f = fn.dynamic(vsite_positions(x, idx, w), box)
            return e, vsite_spread(f, idx, w)

        wrapped.dynamic = _dyn
    if hasattr(fn, "init_state_dynamic"):
        def _init_dyn(x, box):
            return fn.init_state_dynamic(vsite_positions(x, idx, w), box)

        def _apply_dyn(x, st, box):
            e, f, st = fn.apply_dynamic(vsite_positions(x, idx, w), st, box)
            return e, vsite_spread(f, idx, w), st

        wrapped.init_state_dynamic = _init_dyn
        wrapped.apply_dynamic = _apply_dyn
    return wrapped


def n_vsites(system) -> int:
    idx = getattr(system, "vsite_idx", None)
    if idx is None:
        return 0
    return int(idx.shape[0])


__all__ = ["vsite_positions", "vsite_spread", "wrap_force_fn", "n_vsites"]
