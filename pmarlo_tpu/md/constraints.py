"""Holonomic H-bond constraints: parallel SHAKE/RATTLE, jittable.

The reference runs OpenMM with HBonds constraints + HMR 1.5 amu at 2 fs
(src/pmarlo/simulation/__init__.py:68-70). The default JAX path instead
uses HMR 3 amu unconstrained; this module provides the constrained variant
for exact protocol parity.

TPU design: classic SHAKE is Gauss-Seidel (sequential over constraints).
Here both SHAKE and RATTLE run Jacobi-style — every constraint computes its
correction from the same iterate and corrections scatter-add via one-hot
matmuls — a fixed iteration count in a ``fori_loop``, fully vectorized.
X-H constraints form star graphs (a heavy atom with 1-3 hydrogens), for
which Jacobi converges in a handful of sweeps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .system import System


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConstraintSpec:
    """Distance constraints: pairs, target lengths, scatter matrices."""

    s1: jax.Array        # (C, N) one-hot of first atoms
    s2: jax.Array        # (C, N) one-hot of second atoms
    d0: jax.Array        # (C,) target lengths (nm)
    inv_mass_sum: jax.Array  # (C,) 1/m_i + 1/m_j
    inv_m1: jax.Array    # (C,)
    inv_m2: jax.Array    # (C,)
    n_iter: int = dataclasses.field(metadata=dict(static=True), default=30)


def build_h_constraints(system: System, n_iter: int = 30) -> Optional[ConstraintSpec]:
    """Constraints for every bond involving a hydrogen (OpenMM HBonds)."""
    bonds = np.asarray(system.bond_idx)
    masses = np.asarray(system.masses)
    # hydrogens identified structurally (HMR may have raised their mass):
    # an atom is H if its pre-HMR element was H -> use atom_types
    from .ff_params import TYPE_ELEMENTS

    is_h = np.asarray([
        TYPE_ELEMENTS.get(t, "X") == "H" for t in system.atom_types
    ])
    keep = is_h[bonds[:, 0]] | is_h[bonds[:, 1]]
    pairs = bonds[keep]
    r0 = np.asarray(system.bond_r0)[keep]

    # rigid TIP3P: add the H1-H2 distance of every water so SHAKE fixes
    # the full geometry (O-H from the bond set + this closes the angle)
    hh_pairs, hh_r0 = [], []
    by_res: dict = {}
    for i, (rn, an) in enumerate(zip(system.residue_names,
                                     system.atom_names)):
        if rn in ("HOH", "WAT"):
            by_res.setdefault(system.residue_ids[i], {})[an] = i
    for atoms in by_res.values():
        if "H1" in atoms and "H2" in atoms:
            hh_pairs.append((atoms["H1"], atoms["H2"]))
            hh_r0.append(0.15139)  # TIP3P H-H (nm)
    if hh_pairs:
        pairs = np.concatenate(
            [pairs, np.asarray(hh_pairs, pairs.dtype).reshape(-1, 2)]
        )
        r0 = np.concatenate([r0, np.asarray(hh_r0)])

    if pairs.shape[0] == 0:
        return None
    n = system.n_atoms

    def onehot(idx):
        m = np.zeros((len(idx), n), dtype=np.float32)
        m[np.arange(len(idx)), idx] = 1.0
        return jnp.asarray(m)

    inv_m = 1.0 / masses
    return ConstraintSpec(
        s1=onehot(pairs[:, 0]),
        s2=onehot(pairs[:, 1]),
        d0=jnp.asarray(r0, jnp.float32),
        inv_mass_sum=jnp.asarray(inv_m[pairs[:, 0]] + inv_m[pairs[:, 1]], jnp.float32),
        inv_m1=jnp.asarray(inv_m[pairs[:, 0]], jnp.float32),
        inv_m2=jnp.asarray(inv_m[pairs[:, 1]], jnp.float32),
        n_iter=n_iter,
    )


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def shake(
    spec: ConstraintSpec,
    x_new: jax.Array,
    x_ref: jax.Array,
    omega: float = 1.0,
) -> jax.Array:
    """Project positions onto the constraint manifold (parallel SHAKE).

    Corrections act along the *reference* bond vectors (pre-step), the
    classical SHAKE linearization.
    """
    d_ref = _mm(spec.s1, x_ref) - _mm(spec.s2, x_ref)      # (C, 3)

    def body(_, x):
        d_new = _mm(spec.s1, x) - _mm(spec.s2, x)
        diff = jnp.sum(d_new * d_new, axis=1) - spec.d0**2
        denom = 2.0 * spec.inv_mass_sum * jnp.sum(d_new * d_ref, axis=1)
        g = omega * diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        corr = g[:, None] * d_ref                           # (C, 3)
        dx = (
            -_mm(spec.s1.T, corr * spec.inv_m1[:, None])
            + _mm(spec.s2.T, corr * spec.inv_m2[:, None])
        )
        return x + dx

    return jax.lax.fori_loop(0, spec.n_iter, body, x_new)


def rattle(spec: ConstraintSpec, v: jax.Array, x: jax.Array) -> jax.Array:
    """Remove velocity components along constrained bonds (parallel RATTLE)."""
    d = _mm(spec.s1, x) - _mm(spec.s2, x)                   # (C, 3)
    d2 = jnp.sum(d * d, axis=1)

    def body(_, v):
        dv = _mm(spec.s1, v) - _mm(spec.s2, v)
        k = jnp.sum(d * dv, axis=1) / (d2 * spec.inv_mass_sum + 1e-12)
        corr = k[:, None] * d
        return v + (
            -_mm(spec.s1.T, corr * spec.inv_m1[:, None])
            + _mm(spec.s2.T, corr * spec.inv_m2[:, None])
        )

    return jax.lax.fori_loop(0, max(spec.n_iter // 2, 5), body, v)


def constraint_violation(spec: ConstraintSpec, x: jax.Array) -> jax.Array:
    """Max |r - r0| over constraints (diagnostic)."""
    d = _mm(spec.s1, x) - _mm(spec.s2, x)
    r = jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-12)
    return jnp.max(jnp.abs(r - spec.d0))


__all__ = ["ConstraintSpec", "build_h_constraints", "shake", "rattle",
           "constraint_violation"]
