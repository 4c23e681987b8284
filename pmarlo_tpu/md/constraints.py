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
from .topology import _WATER_NAMES


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


def build_h_constraints(
    system: System, n_iter: int = 30, layout: str = "rolled"
):
    """Constraints for every bond involving a hydrogen (OpenMM HBonds).

    ``layout="rolled"`` (default) returns the fast roll-layout spec;
    ``"onehot"`` keeps the original dense-matmul spec (reference
    implementation, used for parity testing)."""
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
        if rn in _WATER_NAMES:
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
    if layout == "rolled":
        # waters get the EXACT rigid solver (Jacobi diverges on their
        # coupled constraint triangles — see RigidWaterSpec); everything
        # else keeps the roll-layout Jacobi (star graphs converge)
        water_atoms = np.asarray([
            rn in _WATER_NAMES
            for rn in system.residue_names
        ])
        water_spec = None
        if water_atoms.any():
            idx = np.flatnonzero(water_atoms)
            start, stop = int(idx[0]), int(idx[-1]) + 1
            names = list(system.atom_names[start:stop])
            # 3-site (TIP3P), 4-site (TIP4P-Ew: trailing massless M) or
            # 5-site (TIP5P: trailing L1/L2 lone pairs) layouts — the
            # virtual rows ride along unconstrained, re-derived by
            # md/vsites.py after every solve
            if len(names) >= 5 and names[3] == "L1":
                stride = 5
            elif len(names) >= 4 and names[3] == "M":
                stride = 4
            else:
                stride = 3
            n_w = (stop - start) // stride
            want = (["O", "H1", "H2"]
                    + {3: [], 4: ["M"], 5: ["L1", "L2"]}[stride])
            if (stop - start != stride * n_w
                    or not water_atoms[start:stop].all()
                    or names != want * n_w):
                raise ValueError(
                    "rigid-water constraints need one contiguous "
                    "(O, H1, H2[, M])-ordered water block (the canonical "
                    "solvate/topology layout)"
                )
            m = masses[start:start + 3]
            # O-H target length from the first water O's bond term; a
            # topology whose water bonds were already stripped falls back
            # to the TIP3P geometry instead of IndexError-ing. Rows with
            # r0 < 0.08 nm are the zero-k O-M (0.0125) / O-L (0.070)
            # virtual-site exclusion bonds, not O-H (0.09572).
            b_idx = np.asarray(system.bond_idx).reshape(-1, 2)
            b_r0 = np.asarray(system.bond_r0)
            oh_rows = np.flatnonzero(
                ((b_idx[:, 0] == start) | (b_idx[:, 1] == start))
                & (b_r0 > 0.08)
            )
            d_oh = (float(b_r0[oh_rows[0]]) if oh_rows.size else 0.09572)
            water_spec = RigidWaterSpec(
                start=start, n_waters=n_w,
                inv_m=jnp.asarray(1.0 / m, jnp.float32),
                d0=jnp.asarray([d_oh, d_oh, 0.15139], jnp.float32),
                stride=stride,
            )
            in_water = water_atoms[pairs[:, 0]] | water_atoms[pairs[:, 1]]
            pairs = pairs[~in_water]
            r0 = r0[~in_water]
        protein_spec = (
            _build_rolled_spec(pairs.astype(np.int64), r0, masses, n_iter)
            if pairs.shape[0] else None
        )
        if water_spec is None:
            return protein_spec
        return CompositeConstraintSpec(protein=protein_spec,
                                       water=water_spec)
    if layout != "onehot":
        raise ValueError(f"unknown constraint layout {layout!r}")
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RolledConstraintSpec:
    """Constraint set in roll layout: constraint c = (i, i + delta_g).

    All H constraints are intra-residue, so index offsets are tiny
    (water: 1, 2; protein C-H/N-H: <= ~4). Grouping by offset turns the
    SHAKE/RATTLE iteration into masked full-vector math over rolled
    (3, N) coordinates — no (C, N) one-hot matmuls, whose 3-wide MXU
    outputs ran at 3/128 utilization and made constraints 20x more
    expensive than the entire periodic force kernel (8.3 ms vs 0.4 ms
    on solvated chignolin).
    """

    deltas: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    #: per-group index into the roll stack (static: resolved at trace time)
    d_idx: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    mask: jax.Array         # (G, N)
    d0: jax.Array           # (G, N)
    inv_m1: jax.Array       # (G, N) 1/m_i at base slots
    inv_m2: jax.Array       # (G, N) 1/m_j at base slots
    inv_mass_sum: jax.Array  # (G, N)
    n_iter: int = dataclasses.field(metadata=dict(static=True), default=30)


def _build_rolled_spec(
    pairs: np.ndarray, r0: np.ndarray, masses: np.ndarray, n_iter: int
) -> RolledConstraintSpec:
    from .bonded_roll import _layered_groups

    n = masses.shape[0]
    # massless rows are virtual sites: they never carry constraints
    # (positions are parent-derived), so their 1/m is never consumed —
    # but a bare divide would emit a RuntimeWarning for every vsite row
    if np.any(masses[pairs.reshape(-1)] <= 0.0):
        raise ValueError(
            "constraint pair references a massless (virtual-site) atom"
        )
    safe = np.where(masses > 0.0, masses, 1.0)
    inv_m = np.where(masses > 0.0, 1.0 / safe, 0.0)
    # layered offset groups; params carried per-constraint
    groups = _layered_groups(
        pairs, [r0, inv_m[pairs[:, 0]], inv_m[pairs[:, 1]],
                inv_m[pairs[:, 0]] + inv_m[pairs[:, 1]]], n,
    )
    deltas = sorted({sig[0] for sig, _, _ in groups})
    d_index = {d: i for i, d in enumerate(deltas)}
    d_idx = np.asarray([d_index[sig[0]] for sig, _, _ in groups], np.int32)
    mask = np.stack([m for _, m, _ in groups])
    p0 = np.stack([ps[0] for _, _, ps in groups])
    p1 = np.stack([ps[1] for _, _, ps in groups])
    p2 = np.stack([ps[2] for _, _, ps in groups])
    p3 = np.stack([ps[3] for _, _, ps in groups])
    return RolledConstraintSpec(
        deltas=tuple(int(d) for d in deltas),
        d_idx=tuple(int(i) for i in d_idx),
        mask=jnp.asarray(mask, jnp.float32),
        d0=jnp.asarray(p0, jnp.float32),
        inv_m1=jnp.asarray(p1, jnp.float32),
        inv_m2=jnp.asarray(p2, jnp.float32),
        inv_mass_sum=jnp.asarray(p3, jnp.float32),
        n_iter=n_iter,
    )


def _roll_stack(xt: jax.Array, deltas) -> jax.Array:
    return jnp.stack([jnp.roll(xt, -d, axis=1) for d in deltas])


def _apply_corrections(spec, corr, xt):
    """xt update from per-group corrections ``corr`` (G, 3, N) defined at
    base slots: -inv_m1 at i, +inv_m2 rolled onto j = i + delta."""
    dx = -jnp.sum(corr * spec.inv_m1[:, None, :], axis=0)
    back = corr * spec.inv_m2[:, None, :]
    # group g scatters to offset deltas[d_idx[g]]: accumulate per delta
    for di, d in enumerate(spec.deltas):
        sel = (np.asarray(spec.d_idx) == di)
        if not sel.any():
            continue
        contrib = jnp.sum(back[np.flatnonzero(sel)], axis=0)
        dx = dx + jnp.roll(contrib, d, axis=1)
    return xt + dx


def shake_rolled(
    spec: RolledConstraintSpec,
    x_new: jax.Array,
    x_ref: jax.Array,
    omega: float = 1.0,
) -> jax.Array:
    """Roll-layout parallel SHAKE (same linearization as ``shake``)."""
    xt_ref = x_ref.astype(jnp.float32).T                  # (3, N)
    R_ref = _roll_stack(xt_ref, spec.deltas)
    d_ref = xt_ref[None] - R_ref[np.asarray(spec.d_idx)]  # (G, 3, N)

    def body(_, xt):
        R = _roll_stack(xt, spec.deltas)
        d_new = xt[None] - R[np.asarray(spec.d_idx)]
        diff = jnp.sum(d_new * d_new, axis=1) - spec.d0**2
        denom = 2.0 * spec.inv_mass_sum * jnp.sum(d_new * d_ref, axis=1)
        g = omega * diff / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        corr = (g * spec.mask)[:, None, :] * d_ref
        return _apply_corrections(spec, corr, xt)

    xt = jax.lax.fori_loop(0, spec.n_iter, body,
                           x_new.astype(jnp.float32).T)
    return xt.T


def rattle_rolled(
    spec: RolledConstraintSpec, v: jax.Array, x: jax.Array
) -> jax.Array:
    """Roll-layout parallel RATTLE (same math as ``rattle``)."""
    xt = x.astype(jnp.float32).T
    R = _roll_stack(xt, spec.deltas)
    d = xt[None] - R[np.asarray(spec.d_idx)]              # (G, 3, N)
    d2 = jnp.sum(d * d, axis=1)

    def body(_, vt):
        Rv = _roll_stack(vt, spec.deltas)
        dv = vt[None] - Rv[np.asarray(spec.d_idx)]
        k = jnp.sum(d * dv, axis=1) / (d2 * spec.inv_mass_sum + 1e-12)
        corr = (k * spec.mask)[:, None, :] * d
        return _apply_corrections(spec, corr, vt)

    vt = jax.lax.fori_loop(0, max(spec.n_iter // 2, 5), body,
                           v.astype(jnp.float32).T)
    return vt.T


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def shake(
    spec,
    x_new: jax.Array,
    x_ref: jax.Array,
    omega: float = 1.0,
) -> jax.Array:
    """Project positions onto the constraint manifold (parallel SHAKE).

    Corrections act along the *reference* bond vectors (pre-step), the
    classical SHAKE linearization. Dispatches on the spec layout.
    """
    if isinstance(spec, CompositeConstraintSpec):
        if spec.protein is not None:
            x_new = shake_rolled(spec.protein, x_new, x_ref, omega)
        if spec.water is not None:
            x_new = shake_water(spec.water, x_new, x_ref)
        return x_new
    if isinstance(spec, RolledConstraintSpec):
        return shake_rolled(spec, x_new, x_ref, omega)
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


def rattle(spec, v: jax.Array, x: jax.Array) -> jax.Array:
    """Remove velocity components along constrained bonds (parallel RATTLE)."""
    if isinstance(spec, CompositeConstraintSpec):
        if spec.protein is not None:
            v = rattle_rolled(spec.protein, v, x)
        if spec.water is not None:
            v = rattle_water(spec.water, v, x)
        return v
    if isinstance(spec, RolledConstraintSpec):
        return rattle_rolled(spec, v, x)
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


def constraint_violation(spec, x: jax.Array) -> jax.Array:
    """Max |r - r0| over constraints (diagnostic)."""
    if isinstance(spec, CompositeConstraintSpec):
        parts = []
        if spec.protein is not None:
            parts.append(constraint_violation(spec.protein, x))
        if spec.water is not None:
            xw = _water_block(spec.water, x)
            d = _dvec(xw)
            r = jnp.sqrt(jnp.sum(d * d, axis=2) + 1e-12)
            parts.append(jnp.max(jnp.abs(r - spec.water.d0[None, :])))
        return jnp.max(jnp.stack(parts)) if parts else jnp.zeros(())
    if isinstance(spec, RolledConstraintSpec):
        xt = x.astype(jnp.float32).T
        R = _roll_stack(xt, spec.deltas)
        d = xt[None] - R[np.asarray(spec.d_idx)]
        r = jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-12)
        err = jnp.where(spec.mask > 0, jnp.abs(r - spec.d0), 0.0)
        return jnp.max(err)
    d = _mm(spec.s1, x) - _mm(spec.s2, x)
    r = jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-12)
    return jnp.max(jnp.abs(r - spec.d0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidWaterSpec:
    """Exact rigid-water (TIP3P) constraints for a CONTIGUOUS block of
    waters laid out (O, H1, H2) per residue — the solvate/topology
    canonical order, so the block is a reshape, not a gather.

    The three coupled distance constraints of a water triangle make
    fixed-point Jacobi SHAKE/RATTLE unstable in dynamics (zero-force
    thermostat test blows up within 500 steps at 2 fs). Here each
    water's 3-constraint cluster is solved EXACTLY: Newton iterations
    with closed-form 3x3 solves for positions (quadratic convergence,
    machine precision in ~4 sweeps), one linear 3x3 solve for
    velocities (RATTLE is linear).
    """

    start: int = dataclasses.field(metadata=dict(static=True))
    n_waters: int = dataclasses.field(metadata=dict(static=True))
    inv_m: jax.Array      # (3,) 1/m for (O, H, H) (post-HMR)
    d0: jax.Array         # (3,) targets for (O-H1, O-H2, H1-H2)
    n_newton: int = dataclasses.field(metadata=dict(static=True), default=6)
    #: atoms per water residue: 3 (TIP3P) or 4 (TIP4P-Ew, whose massless
    #: M virtual site rides along unconstrained — md/vsites.py re-derives
    #: it from the solved O/H positions each step)
    stride: int = dataclasses.field(metadata=dict(static=True), default=3)


#: constraint pair slots within one water: (O,H1), (O,H2), (H1,H2)
_W_PAIRS = ((0, 1), (0, 2), (1, 2))


def _solve33(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 solve via the adjugate (W, 3, 3)x(W, 3)."""
    a00, a01, a02 = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    a10, a11, a12 = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
    a20, a21, a22 = A[:, 2, 0], A[:, 2, 1], A[:, 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    x0 = (c00 * b[:, 0] + c01 * b[:, 1] + c02 * b[:, 2]) * inv_det
    x1 = (c10 * b[:, 0] + c11 * b[:, 1] + c12 * b[:, 2]) * inv_det
    x2 = (c20 * b[:, 0] + c21 * b[:, 1] + c22 * b[:, 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=1)


def _water_block(spec: RigidWaterSpec, x: jax.Array) -> jax.Array:
    return jax.lax.dynamic_slice_in_dim(
        x, spec.start, spec.stride * spec.n_waters, axis=0
    ).reshape(spec.n_waters, spec.stride, 3)[:, :3]


def _dvec(xw: jax.Array) -> jax.Array:
    """(W, 3 constraints, 3 xyz) bond vectors for the three pairs."""
    return jnp.stack(
        [xw[:, i] - xw[:, j] for i, j in _W_PAIRS], axis=1
    )


def _water_lanes(spec: RigidWaterSpec, x: jax.Array) -> jax.Array:
    """Water block in lanes-flat (3 atoms, 3 xyz, W) layout.

    The straightforward (W, 3, 3) layout puts the 3x3 per-water geometry
    on the TPU's tiled trailing dims — 3/8 sublane x 3/128 lane
    utilization; the whole solver ran at ~3 ms for 9k waters. With W on
    the lane axis every op is a full-width elementwise vector op
    (measured ~10x faster, same math)."""
    blk = jax.lax.dynamic_slice_in_dim(
        x, spec.start, spec.stride * spec.n_waters, axis=0
    )                                               # (stride*W, 3)
    return (blk.reshape(spec.n_waters, spec.stride, 3)[:, :3]
            .transpose(1, 2, 0))


def _dvec_lanes(xb: jax.Array) -> jax.Array:
    """(3 constraints, 3 xyz, W) bond vectors from a lanes-flat block."""
    return jnp.stack([xb[i] - xb[j] for i, j in _W_PAIRS])


#: B[c, a] = +1 if atom a is i(c), -1 if j(c), else 0 (constraint, atom)
_W_SGN = np.zeros((3, 3), np.float32)
for _c, (_i, _j) in enumerate(_W_PAIRS):
    _W_SGN[_c, _i] = 1.0
    _W_SGN[_c, _j] = -1.0


def _solve33_lanes(G, b):
    """Closed-form 3x3 solve via the adjugate, entries as (W,) lanes.
    ``G``: nested 3x3 list of (W,) arrays; ``b``: list of 3 (W,)."""
    c00 = G[1][1] * G[2][2] - G[1][2] * G[2][1]
    c01 = G[0][2] * G[2][1] - G[0][1] * G[2][2]
    c02 = G[0][1] * G[1][2] - G[0][2] * G[1][1]
    c10 = G[1][2] * G[2][0] - G[1][0] * G[2][2]
    c11 = G[0][0] * G[2][2] - G[0][2] * G[2][0]
    c12 = G[0][2] * G[1][0] - G[0][0] * G[1][2]
    c20 = G[1][0] * G[2][1] - G[1][1] * G[2][0]
    c21 = G[0][1] * G[2][0] - G[0][0] * G[2][1]
    c22 = G[0][0] * G[1][1] - G[0][1] * G[1][0]
    det = G[0][0] * c00 + G[0][1] * c01 + G[0][2] * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    return [
        (c00 * b[0] + c01 * b[1] + c02 * b[2]) * inv_det,
        (c10 * b[0] + c11 * b[1] + c12 * b[2]) * inv_det,
        (c20 * b[0] + c21 * b[1] + c22 * b[2]) * inv_det,
    ]


def shake_water(
    spec: RigidWaterSpec, x_new: jax.Array, x_ref: jax.Array
) -> jax.Array:
    """Exact SHAKE: x = x_unc + M^-1 J_ref^T lam, Newton on sigma(lam)."""
    xb = _water_lanes(spec, x_new)                    # (3, 3, W)
    xr = _water_lanes(spec, x_ref)
    d_ref = _dvec_lanes(xr)                           # (3c, 3x, W)
    im = spec.inv_m                                   # traced (3,)

    def apply_lam(lam):
        # dx[a] = sum_c lam_c * sgn[c, a] * im[a] * d_ref[c]; lam (3, 1, W)
        return jnp.stack([
            im[a] * sum(
                float(_W_SGN[c, a]) * lam[c] * d_ref[c]
                for c in range(3) if _W_SGN[c, a] != 0.0
            )
            for a in range(3)
        ])

    def body(_, lam):
        xcur = xb + apply_lam(lam[:, None, :])
        d = _dvec_lanes(xcur)                         # (3c, 3x, W)
        sigma = [
            jnp.sum(d[c] * d[c], axis=0) - spec.d0[c] ** 2
            for c in range(3)
        ]
        # Newton Jacobian G[c][cp] = dsigma_c/dlam_cp
        #   = 2 (sgn[cp, i_c] im[i_c] - sgn[cp, j_c] im[j_c]) d_c . d_ref_cp
        G = [[None] * 3 for _ in range(3)]
        for c, (i, j) in enumerate(_W_PAIRS):
            for cp in range(3):
                vec = _W_SGN[cp, i] * im[i] - _W_SGN[cp, j] * im[j]
                G[c][cp] = 2.0 * vec * jnp.sum(d[c] * d_ref[cp], axis=0)
        step = _solve33_lanes(G, sigma)
        return lam - jnp.stack(step)

    lam0 = jnp.zeros((3, spec.n_waters), xb.dtype)
    lam = jax.lax.fori_loop(0, spec.n_newton, body, lam0)
    x_out = xb + apply_lam(lam[:, None, :])
    return _write_water_block(spec, x_new, x_out)


def _write_water_block(spec: RigidWaterSpec, full: jax.Array,
                       lanes_out: jax.Array) -> jax.Array:
    """Scatter a lanes-flat (3 atoms, 3 xyz, W) result back into the
    full array, leaving stride-4 virtual-site rows untouched."""
    out3 = lanes_out.transpose(2, 0, 1)              # (W, 3, 3)
    if spec.stride == 3:
        flat = out3.reshape(3 * spec.n_waters, 3)
    else:
        blk = jax.lax.dynamic_slice_in_dim(
            full, spec.start, spec.stride * spec.n_waters, axis=0
        ).reshape(spec.n_waters, spec.stride, 3)
        flat = blk.at[:, :3].set(out3.astype(blk.dtype)).reshape(
            spec.stride * spec.n_waters, 3)
    return jax.lax.dynamic_update_slice_in_dim(
        full, flat.astype(full.dtype), spec.start, axis=0
    )


def rattle_water(
    spec: RigidWaterSpec, v: jax.Array, x: jax.Array
) -> jax.Array:
    """Exact RATTLE: (J M^-1 J^T) lam = -J v, one 3x3 solve per water."""
    xb = _water_lanes(spec, x)
    vb = _water_lanes(spec, v)
    d = _dvec_lanes(xb)                               # (3c, 3x, W)
    dv = _dvec_lanes(vb)
    im = spec.inv_m                                   # traced (3,)
    rhs = [-jnp.sum(d[c] * dv[c], axis=0) for c in range(3)]
    # A[c][cp] = (sgn[cp, i_c] im[i_c] - sgn[cp, j_c] im[j_c]) d_c . d_cp
    A = [[None] * 3 for _ in range(3)]
    for c, (i, j) in enumerate(_W_PAIRS):
        for cp in range(3):
            vec = _W_SGN[cp, i] * im[i] - _W_SGN[cp, j] * im[j]
            A[c][cp] = vec * jnp.sum(d[c] * d[cp], axis=0)
    lam = _solve33_lanes(A, rhs)
    dvb = jnp.stack([
        im[a] * sum(
            float(_W_SGN[c, a]) * lam[c][None, :] * d[c]
            for c in range(3) if _W_SGN[c, a] != 0.0
        )
        for a in range(3)
    ])
    return _write_water_block(spec, v, vb + dvb)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompositeConstraintSpec:
    """Protein H constraints (roll layout) + rigid-water block; clusters
    are disjoint so the two solvers compose without coupling."""

    protein: Optional[RolledConstraintSpec]
    water: Optional[RigidWaterSpec]


def strip_constrained_bonded(system: System) -> System:
    """System copy with constrained bonded force terms removed, matching
    OpenMM ``createSystem(constraints=HBonds, rigidWater=True)``
    semantics: bonds to hydrogen carry no bond force (the constraint
    replaces them) and rigid-water H-O-H angles carry no angle force.

    Use the stripped system for the MD force path when integrating with
    ``build_h_constraints``; keep the FULL system for unconstrained
    minimization (bad initial H geometry needs the stiff bonds). On a
    27k-atom water box the rigid-water bond/angle evaluation wasted
    1.17 ms/step in-scan.

    SHAKE holds constrained bonds at r0 (E = 0) and the water H-H
    distance fixes the angle at t0 (E ~ 0), so reported potential
    energies are unchanged to f32 noise."""
    from .ff_params import TYPE_ELEMENTS

    bonds = np.asarray(system.bond_idx).reshape(-1, 2)
    is_h = np.asarray([
        TYPE_ELEMENTS.get(t, "X") == "H" for t in system.atom_types
    ])
    changes = {}
    if bonds.shape[0]:
        keep_b = ~(is_h[bonds[:, 0]] | is_h[bonds[:, 1]])
        if not keep_b.all():
            changes.update(
                bond_idx=jnp.asarray(bonds[keep_b], jnp.int32),
                bond_k=jnp.asarray(np.asarray(system.bond_k)[keep_b]),
                bond_r0=jnp.asarray(np.asarray(system.bond_r0)[keep_b]),
            )
    water_atoms = np.asarray([
        rn in _WATER_NAMES for rn in system.residue_names
    ])
    angles = np.asarray(system.angle_idx).reshape(-1, 3)
    if angles.shape[0] and water_atoms.any():
        keep_a = ~(water_atoms[angles[:, 0]] & water_atoms[angles[:, 1]]
                   & water_atoms[angles[:, 2]])
        if not keep_a.all():
            changes.update(
                angle_idx=jnp.asarray(angles[keep_a], jnp.int32),
                angle_k=jnp.asarray(np.asarray(system.angle_k)[keep_a]),
                angle_t0=jnp.asarray(np.asarray(system.angle_t0)[keep_a]),
            )
    return dataclasses.replace(system, **changes) if changes else system


def n_constraints(spec) -> int:
    """Constraint count for any spec layout."""
    if isinstance(spec, CompositeConstraintSpec):
        total = 0
        if spec.protein is not None:
            total += n_constraints(spec.protein)
        if spec.water is not None:
            total += 3 * spec.water.n_waters
        return total
    if isinstance(spec, RolledConstraintSpec):
        return int(np.asarray(spec.mask).sum())
    return int(spec.d0.shape[0])


__all__ = ["ConstraintSpec", "RolledConstraintSpec", "RigidWaterSpec",
           "CompositeConstraintSpec", "build_h_constraints",
           "n_constraints", "strip_constrained_bonded",
           "shake", "rattle", "shake_rolled", "rattle_rolled",
           "constraint_violation"]
