"""Triclinic periodic-cell utilities.

The round-3 explicit-solvent engine (md/cells.py + md/pallas_cells.py)
was orthorhombic-only; GROMACS/CHARMM-GUI-prepared inputs are typically
triclinic (rhombic dodecahedron / truncated octahedron cells save ~29%
of the water volume for the same solute clearance — a direct throughput
win). This module supplies the lattice algebra; the cell engine
generalizes cheaply because its ghost-padded design already banishes
minimum-image arithmetic from the kernel: wrapping a ghost layer just
adds the corresponding LATTICE VECTOR (not an axis-aligned box length),
and binning moves to fractional coordinates. The kernel itself computes
plain Cartesian distances and needs no change.

Conventions (GROMACS reduced form; rows are lattice vectors, positions
are row vectors so ``x = f @ H``):

    H = [[ax, 0,  0 ],
         [bx, by, 0 ],
         [cx, cy, cz]]      with ax, by, cz > 0,
    |bx| <= ax/2,  |cx| <= ax/2,  |cy| <= by/2.

The triclinic ``tilt`` is the off-diagonal triple ``(bx, cx, cy)`` —
``System.box`` keeps carrying the diagonal ``(ax, by, cz)`` so every
orthorhombic consumer is untouched, and ``System.tilt`` is ``None`` for
orthorhombic cells.

Correctness bound: with slab perpendicular widths >= cutoff per cell
layer, the fractional coordinate along axis k IS the normal-projected
coordinate scaled by the perpendicular width, so two atoms within the
cutoff always land in adjacent (or same) cells — the 27-neighborhood
cover argument carries over from the orthorhombic case verbatim.

Reference role anchor: the OpenMM System the reference builds for
solvated prep accepts arbitrary periodic box vectors
(/root/reference/src/pmarlo/protein/protein.py:733); CRYST1 angle
handling replaces the round-3 reject-with-warning in io/pdb.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Tilt = Tuple[float, float, float]


def box_matrix(
    box: Sequence[float], tilt: Optional[Sequence[float]] = None
) -> np.ndarray:
    """(3, 3) lattice matrix H (rows = a, b, c) from diagonal lengths
    ``box`` = (ax, by, cz) and off-diagonal ``tilt`` = (bx, cx, cy)."""
    ax, by, cz = (float(v) for v in box)
    bx, cx, cy = (0.0, 0.0, 0.0) if tilt is None else (
        float(v) for v in tilt
    )
    return np.array(
        [[ax, 0.0, 0.0], [bx, by, 0.0], [cx, cy, cz]], dtype=np.float64
    )


def reduce_box_matrix(H: np.ndarray) -> np.ndarray:
    """Lattice reduction to the GROMACS form (|bx| <= ax/2 etc.).

    Adding integer multiples of one lattice vector to another describes
    the SAME lattice; positions re-image correctly through wrapping."""
    H = np.array(H, dtype=np.float64)

    def rt(v: float) -> float:
        # tolerant round: the |t| == half-diagonal boundary (the
        # rhombic dodecahedron sits exactly there) canonicalizes to the
        # POSITIVE representation regardless of float roundoff —
        # +0.5(+eps) stays, -0.5(-eps) flips to +0.5
        return np.floor(v + 0.5 - 1e-9)

    # order matters: reduce c against b first (changes cx too), then
    # c and b against a
    H[2] -= H[1] * rt(H[2, 1] / H[1, 1])
    H[2] -= H[0] * rt(H[2, 0] / H[0, 0])
    H[1] -= H[0] * rt(H[1, 0] / H[0, 0])
    return H


def split_matrix(H: np.ndarray) -> Tuple[Tuple[float, float, float],
                                         Optional[Tilt]]:
    """(box diagonal, tilt-or-None) from a lower-triangular H."""
    H = np.asarray(H, dtype=np.float64)
    if (abs(H[0, 1]) > 1e-12 or abs(H[0, 2]) > 1e-12
            or abs(H[1, 2]) > 1e-12):
        raise ValueError(
            "box matrix must be lower-triangular (rows a, b, c with "
            "a along x and b in the xy plane); rotate the cell first"
        )
    box = (float(H[0, 0]), float(H[1, 1]), float(H[2, 2]))
    tilt = (float(H[1, 0]), float(H[2, 0]), float(H[2, 1]))
    if max(abs(t) for t in tilt) < 1e-9:
        return box, None
    return box, tilt


def from_lengths_angles(
    a: float, b: float, c: float,
    alpha: float, beta: float, gamma: float,
) -> Tuple[Tuple[float, float, float], Optional[Tilt]]:
    """CRYST1 cell (lengths nm, angles degrees) -> (box, tilt) in
    reduced form. Standard crystallographic construction: a along x,
    b in the xy plane."""
    al, be, ga = (np.deg2rad(v) for v in (alpha, beta, gamma))
    bx = b * np.cos(ga)
    by = b * np.sin(ga)
    cx = c * np.cos(be)
    cy = c * (np.cos(al) - np.cos(be) * np.cos(ga)) / np.sin(ga)
    cz2 = c * c - cx * cx - cy * cy
    # 'not (> 0)' rather than '<= 0': gamma == 0 makes cy = 0/0 = NaN,
    # and NaN <= 0 is False — the degenerate cell must still raise
    if not (cz2 > 0.0):
        raise ValueError(
            f"degenerate cell: lengths ({a}, {b}, {c}) nm with angles "
            f"({alpha}, {beta}, {gamma}) deg have no positive volume"
        )
    H = reduce_box_matrix(
        np.array([[a, 0.0, 0.0], [bx, by, 0.0], [cx, cy, np.sqrt(cz2)]])
    )
    box, tilt = split_matrix(H)
    # snap angle roundoff (90.00 deg stored in 2 decimals) to exactly
    # orthorhombic when the tilt is within PDB-format precision
    if tilt is not None and max(abs(t) for t in tilt) < 5e-4 * max(a, b, c):
        return box, None
    return box, tilt


def to_lengths_angles(
    box: Sequence[float], tilt: Optional[Sequence[float]] = None
) -> Tuple[float, float, float, float, float, float]:
    """(a, b, c, alpha, beta, gamma) — lengths nm, angles degrees."""
    H = box_matrix(box, tilt)
    la, lb, lc = (float(np.linalg.norm(H[i])) for i in range(3))
    cosa = float(np.dot(H[1], H[2]) / (lb * lc))
    cosb = float(np.dot(H[0], H[2]) / (la * lc))
    cosg = float(np.dot(H[0], H[1]) / (la * lb))
    return (la, lb, lc, *(float(np.rad2deg(np.arccos(v)))
                          for v in (cosa, cosb, cosg)))


def validate_reduced(H: np.ndarray) -> None:
    """Raise unless H is in reduced form with positive diagonal."""
    H = np.asarray(H, dtype=np.float64)
    if not (H[0, 0] > 0 and H[1, 1] > 0 and H[2, 2] > 0):
        raise ValueError(f"box diagonal must be positive, got {np.diag(H)}")
    # strict inequality with a tiny slack: exactly ax/2 is legal
    eps = 1e-7 * max(H[0, 0], H[1, 1], H[2, 2])
    if (abs(H[1, 0]) > 0.5 * H[0, 0] + eps
            or abs(H[2, 0]) > 0.5 * H[0, 0] + eps
            or abs(H[2, 1]) > 0.5 * H[1, 1] + eps):
        raise ValueError(
            f"box tilt {H[1, 0], H[2, 0], H[2, 1]} exceeds the reduced "
            f"bound (ax/2, ax/2, by/2) = "
            f"{0.5 * H[0, 0], 0.5 * H[0, 0], 0.5 * H[1, 1]}; call "
            "reduce_box_matrix first"
        )


def perp_widths(H: np.ndarray) -> np.ndarray:
    """(3,) perpendicular distances between opposite cell faces: the
    quantity the cutoff/cell-cover conditions bound (for orthorhombic
    cells these ARE the box lengths).  d_k = V / |a_i x a_j|."""
    H = np.asarray(H, dtype=np.float64)
    V = abs(float(np.linalg.det(H)))
    return np.array([
        V / np.linalg.norm(np.cross(H[1], H[2])),
        V / np.linalg.norm(np.cross(H[2], H[0])),
        V / np.linalg.norm(np.cross(H[0], H[1])),
    ])


def volume(box: Sequence[float],
           tilt: Optional[Sequence[float]] = None) -> float:
    """Cell volume (nm^3). Lower-triangular H: product of the diagonal
    (the tilt never changes the volume)."""
    return float(np.prod([float(v) for v in box]))


#: lattice transforms run at HIGHEST matmul precision: TPU matmul units
#: take bf16 inputs by default (8 mantissa bits), and a ~0.01 nm error
#: in a fractional coordinate flips floor/round near cell boundaries —
#: atoms land in wrong cells / wrong images and the triclinic energy
#: breaks by O(100) kJ/mol (measured on chip, round 5; the same failure
#: mode as the PME spreading noise). These are (N, 3) @ (3, 3) products:
#: the precision pin costs nothing measurable.
_LAT_PREC = jax.lax.Precision.HIGHEST


def latmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lattice-transform matmul pinned to HIGHEST precision."""
    return jnp.matmul(a, b, precision=_LAT_PREC)


def wrap_frac(x: jax.Array, H: jax.Array, Hinv: jax.Array) -> jax.Array:
    """Wrap positions into the primary cell via fractional coordinates.
    ``H``/``Hinv`` are (3, 3) arrays (static constants under jit)."""
    f = latmul(x, Hinv)
    f = f - jnp.floor(f)
    return latmul(f, H)


def min_image_round(d: jax.Array, H: jax.Array,
                    Hinv: jax.Array) -> jax.Array:
    """Nearest-image displacement by component rounding in fractional
    space. Exact whenever the true minimal distance is below half the
    smallest perpendicular width — every cutoff-bounded use qualifies
    (the engine enforces perp widths >= 2*cutoff). For orthorhombic H
    this is literally ``d - box * round(d / box)``."""
    return d - latmul(jnp.round(latmul(d, Hinv)), H)


def min_image_exact(d: jax.Array, H: jax.Array) -> jax.Array:
    """True minimum-image displacement by brute force over the 27
    neighbor images (oracle/tests; valid for any displacement whose
    minimum image lies within one cell of the rounded one — always true
    in reduced form)."""
    Hj = jnp.asarray(H, d.dtype)
    base = d - latmul(jnp.round(latmul(d, jnp.asarray(
        np.linalg.inv(np.asarray(H, np.float64)), d.dtype))), Hj)
    shifts = latmul(jnp.asarray(
        np.array(np.meshgrid(*([[-1.0, 0.0, 1.0]] * 3),
                             indexing="ij")).reshape(3, -1).T,
        d.dtype,
    ), Hj)                                               # (27, 3)
    cand = base[..., None, :] + shifts                   # (..., 27, 3)
    r2 = jnp.sum(cand * cand, axis=-1)
    pick = jnp.argmin(r2, axis=-1)
    return jnp.take_along_axis(
        cand, pick[..., None, None], axis=-2
    )[..., 0, :]


def tilt_ratios(box: Sequence[float],
                tilt: Sequence[float]) -> Tuple[float, float, float]:
    """Static (bx/ax, cx/ax, cy/by). The Monte-Carlo barostat's volume
    moves scale the whole lattice isotropically, so these ratios are
    INVARIANT along an NPT trajectory: a traced (3,) diagonal plus the
    static ratios fully determines the evolving triclinic cell — the
    barostat itself never needs to know about tilt."""
    ax, by, _ = (float(v) for v in box)
    bx, cx, cy = (float(v) for v in tilt)
    return (bx / ax, cx / ax, cy / by)


def traced_matrices(box: jax.Array,
                    ratios: Sequence[float]) -> Tuple[jax.Array, jax.Array]:
    """(H, Hinv) as (3, 3) device arrays from a traced (3,) diagonal and
    static tilt ratios (closed-form lower-triangular inverse — no
    linalg solve inside the step). With a constant ``box`` XLA folds
    both to compile-time constants, so the static path can share this
    code without cost."""
    a, b, c = box[0], box[1], box[2]
    rbx, rcx, rcy = (float(r) for r in ratios)
    p, q, r = rbx * a, rcx * a, rcy * b
    z = jnp.zeros_like(a)
    H = jnp.stack([
        jnp.stack([a, z, z]),
        jnp.stack([p, b, z]),
        jnp.stack([q, r, c]),
    ])
    Hinv = jnp.stack([
        jnp.stack([1.0 / a, z, z]),
        jnp.stack([-p / (a * b), 1.0 / b, z]),
        jnp.stack([(p * r - q * b) / (a * b * c), -r / (b * c), 1.0 / c]),
    ])
    return H, Hinv


def traced_perp_widths(box: jax.Array,
                       ratios: Sequence[float]) -> jax.Array:
    """(3,) perpendicular widths from a traced diagonal + static
    ratios (the dynamic-box cutoff-cover guard)."""
    H, _ = traced_matrices(box, ratios)
    V = box[0] * box[1] * box[2]
    cross = jnp.stack([
        jnp.cross(H[1], H[2]),
        jnp.cross(H[2], H[0]),
        jnp.cross(H[0], H[1]),
    ])
    return V / jnp.sqrt(jnp.sum(cross * cross, axis=1))


def dodecahedron_vectors(d: float) -> Tuple[Tuple[float, float, float],
                                            Tilt]:
    """Rhombic-dodecahedron cell with image distance ``d`` (nm) in
    reduced triclinic form (the GROMACS ``-bt dodecahedron`` cell,
    xy-square variant): volume 0.707 d^3 vs the cube's d^3 — ~29% less
    solvent for the same solute clearance."""
    d = float(d)
    return ((d, d, d * np.sqrt(2.0) / 2.0),
            (0.0, d / 2.0, d / 2.0))
