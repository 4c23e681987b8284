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


def vsite_positions(
    x: jax.Array, idx: jax.Array, w: jax.Array,
    kind: jax.Array | None = None,
) -> jax.Array:
    """Overwrite site rows with their parent-defined positions.

    ``idx`` (V, 4) int32 [site, p0, p1, p2]; ``w`` (V, 3) weights.
    ``kind`` (V,) int32 selects the construction per site (``None`` means
    all-average, the historical layout):

    * 0 — ThreeParticleAverageSite: r = w0 r_p0 + w1 r_p1 + w2 r_p2
      (TIP4P-Ew M sites; linear, position-independent Jacobian).
    * 1 — OutOfPlaneSite (OpenMM semantics): with d12 = r_p1 - r_p0 and
      d13 = r_p2 - r_p0, r = r_p0 + w0 d12 + w1 d13 + w2 (d12 x d13)
      (TIP5P lone pairs; the cross term leaves the parents' plane, so
      the Jacobian depends on positions).

    Differentiable — ``jax.grad`` through this IS the force spread."""
    site = idx[:, 0]
    p0, p1, p2 = x[idx[:, 1]], x[idx[:, 2]], x[idx[:, 3]]
    r = w[:, 0:1] * p0 + w[:, 1:2] * p1 + w[:, 2:3] * p2
    if kind is not None:
        d12 = p1 - p0
        d13 = p2 - p0
        r_oop = (p0 + w[:, 0:1] * d12 + w[:, 1:2] * d13
                 + w[:, 2:3] * jnp.cross(d12, d13))
        r = jnp.where((kind == 1)[:, None], r_oop, r)
    return x.at[site].set(r)


def vsite_spread(
    f: jax.Array, idx: jax.Array, w: jax.Array,
    kind: jax.Array | None = None, x: jax.Array | None = None,
) -> jax.Array:
    """Redistribute site forces onto parents (J^T of ``vsite_positions``)
    and zero the site rows — for HAND-WRITTEN force kernels whose output
    is not produced by autodiff through the expansion.

    With out-of-plane sites present (``kind`` given) the Jacobian depends
    on the parents' positions, so ``x`` is required and the spread is the
    exact VJP of the expansion; the all-average path keeps the cheap
    constant-weight scatter."""
    if kind is not None:
        if x is None:
            raise ValueError(
                "vsite_spread with out-of-plane sites needs the positions "
                "the forces were evaluated at (the Jacobian is "
                "position-dependent)"
            )
        _, vjp = jax.vjp(lambda xx: vsite_positions(xx, idx, w, kind), x)
        return vjp(f)[0]
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
    kind = getattr(system, "vsite_kind", None)

    def wrapped(x):
        xf = vsite_positions(x, idx, w, kind)
        e, f = fn(xf)
        return e, vsite_spread(f, idx, w, kind, xf)

    if hasattr(fn, "init_state"):
        def _init(x):
            return fn.init_state(vsite_positions(x, idx, w, kind))

        def _apply(x, st):
            xf = vsite_positions(x, idx, w, kind)
            e, f, st = fn.apply(xf, st)
            return e, vsite_spread(f, idx, w, kind, xf), st

        wrapped.init_state = _init
        wrapped.apply = _apply
    if hasattr(fn, "init_state_batched"):
        vexp = jax.vmap(lambda xx: vsite_positions(xx, idx, w, kind))
        vspr = jax.vmap(lambda ff, xx: vsite_spread(ff, idx, w, kind, xx))

        def _init_b(xs):
            return fn.init_state_batched(vexp(xs))

        def _apply_b(xs, st):
            xf_b = vexp(xs)
            e_b, f_b, st = fn.apply_batched(xf_b, st)
            return e_b, vspr(f_b, xf_b), st

        wrapped.init_state_batched = _init_b
        wrapped.apply_batched = _apply_b
    # metadata attributes ride along untouched
    for attr in ("pme_mesh_shape", "pme_order", "grid", "tile_list_width",
                 "electrostatics", "skin", "local_shapes"):
        if hasattr(fn, attr):
            setattr(wrapped, attr, getattr(fn, attr))
    if hasattr(fn, "check_overflow"):
        wrapped.check_overflow = (
            lambda x: fn.check_overflow(vsite_positions(x, idx, w, kind))
        )
    if hasattr(fn, "dynamic"):
        def _dyn(x, box):
            xf = vsite_positions(x, idx, w, kind)
            e, f = fn.dynamic(xf, box)
            return e, vsite_spread(f, idx, w, kind, xf)

        wrapped.dynamic = _dyn
    if hasattr(fn, "init_state_dynamic"):
        def _init_dyn(x, box):
            return fn.init_state_dynamic(
                vsite_positions(x, idx, w, kind), box)

        def _apply_dyn(x, st, box):
            xf = vsite_positions(x, idx, w, kind)
            e, f, st = fn.apply_dynamic(xf, st, box)
            return e, vsite_spread(f, idx, w, kind, xf), st

        wrapped.init_state_dynamic = _init_dyn
        wrapped.apply_dynamic = _apply_dyn
    return wrapped


def n_vsites(system) -> int:
    idx = getattr(system, "vsite_idx", None)
    if idx is None:
        return 0
    return int(idx.shape[0])


__all__ = ["vsite_positions", "vsite_spread", "wrap_force_fn", "n_vsites"]
