"""Roll-based bonded energies: gather-free bonds/angles/torsions on TPU.

Measured on 3gd8 (N=3350, v5e). Standalone-dispatch timings said the
gather/scatter bonded formulation (md/forces.py) costs 2.9 ms/step vs
1.5 ms for this module — but those dispatches are RPC-dominated on the
tunneled device. The measurement that matters (500-step lax.scan, one
dispatch) says the OPPOSITE: full force path 2.68 ms/step with gathers
vs 3.65 ms with rolls. XLA hides the serialized gather latency inside
the scan better than it schedules this module's (G, 3, N) batched
intermediates. Consequently md/pallas_pair.py keeps the gather
formulation; this module remains as the exact-parity-tested alternative
for hardware/workloads where the trade flips (and as the measured
record of the experiment).

The fix exploits template ordering: bonded terms connect atoms at SMALL
index offsets (3gd8: bonds span 20 distinct offset patterns, angles 95,
torsions 265, max |offset| 30). Group terms by their offset signature
(j-i, k-i, ...) and evaluate each group as a masked FULL-VECTOR pass
over rolled coordinate arrays:

    E_g = sum_i  mask_g(i) * V(x[i], roll(x, -d1)[i], ...)

``jnp.roll`` is a cheap lane shift, and — crucially — its transpose is
another roll, so ``jax.grad`` of this formulation contains NO scatters.
Same-signature collisions (AMBER torsion Fourier multiplicity: one
quadruple, several periodicities) go into separate layers.

Work is O(n_combos * N) with ~4% lane utilization for torsions — still
~100x cheaper than serialized gathers at protein scale, and exactly the
style of trade TPUs reward (dense regular vectors over sparse access).

Parity: tests/unit/test_bonded_roll.py checks energies AND grad forces
against md/forces.py on alanine and (when mounted) 3gd8 to f32 epsilon.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .system import System

_EPS = 1e-12


def _layered_groups(
    idx: np.ndarray, params: List[np.ndarray], n_atoms: int
) -> List[Tuple[Tuple[int, ...], np.ndarray, List[np.ndarray]]]:
    """Group terms by offset signature; collide same-base terms into
    layers. Returns [(deltas, mask (N,), [param arrays (N,)])]."""
    idx = np.asarray(idx)
    if idx.size == 0:
        return []
    base = idx[:, 0]
    deltas = idx[:, 1:] - base[:, None]
    groups: Dict[Tuple[int, ...], List[int]] = {}
    for t, row in enumerate(deltas):
        groups.setdefault(tuple(int(d) for d in row), []).append(t)

    out = []
    for sig, terms in sorted(groups.items()):
        # layer terms so each base atom appears at most once per layer
        layers: List[List[int]] = []
        seen: List[set] = []
        for t in terms:
            b = int(base[t])
            for layer, s in zip(layers, seen):
                if b not in s:
                    layer.append(t)
                    s.add(b)
                    break
            else:
                layers.append([t])
                seen.append({b})
        for layer in layers:
            mask = np.zeros(n_atoms, np.float32)
            p_arrs = [np.zeros(n_atoms, np.float32) for _ in params]
            b_idx = base[layer]
            mask[b_idx] = 1.0
            for p_arr, p in zip(p_arrs, params):
                p_arr[b_idx] = np.asarray(p)[layer]
            out.append((sig, mask, p_arrs))
    return out


def build_rolled_bonded(system: System) -> Callable[[jax.Array], jax.Array]:
    """``energy_fn(x (N,3)) -> scalar`` for bonds + angles + torsions,
    gather-free (see module docstring). Matches md/forces.py term math
    (forces.py:34,41,77) exactly.

    Layout matters as much as the rolls: the math runs in (3, N) and the
    per-type groups are BATCHED into (G, 3, N)/(G, N) tensors — a (N, 3)
    array tiles 3 -> 128 lanes (42x waste) and a per-group Python loop
    emits thousands of unfusable small ops (measured 4.2 ms, worse than
    the gathers). Batched (G, 3, N) passes are a handful of large VPU
    ops. The only gathers left select whole (3, N) rows out of the (D,
    3, N) roll stack with STATIC indices — row gathers of contiguous
    10 KB slices, which XLA lowers to cheap dynamic-slices (and their
    transpose to a static segment-sum over D <= 64 rows, not a per-atom
    scatter)."""
    n = system.n_atoms

    bond_groups = _layered_groups(
        np.asarray(system.bond_idx),
        [np.asarray(system.bond_k), np.asarray(system.bond_r0)], n,
    )
    angle_groups = _layered_groups(
        np.asarray(system.angle_idx),
        [np.asarray(system.angle_k), np.asarray(system.angle_t0)], n,
    )
    torsion_groups = _layered_groups(
        np.asarray(system.torsion_idx),
        [np.asarray(system.torsion_k), np.asarray(system.torsion_n),
         np.asarray(system.torsion_phase)], n,
    )

    # distinct roll offsets across every group (0 = identity, always first)
    deltas = {0}
    for groups in (bond_groups, angle_groups, torsion_groups):
        for sig, _, _ in groups:
            deltas.update(sig)
    all_deltas = sorted(deltas)
    d_index = {d: i for i, d in enumerate(all_deltas)}

    def batch(groups, arity):
        """(delta-row indices (arity, G), mask (G, N), params [(G, N)])."""
        if not groups:
            return None
        idxs = np.asarray(
            [[d_index[sig[a]] for sig, _, _ in groups]
             for a in range(arity)], dtype=np.int32)
        masks = jnp.asarray(np.stack([m for _, m, _ in groups]))
        n_params = len(groups[0][2])
        params = [
            jnp.asarray(np.stack([ps[p] for _, _, ps in groups]))
            for p in range(n_params)
        ]
        return idxs, masks, params

    bond_b = batch(bond_groups, 1)
    angle_b = batch(angle_groups, 2)
    torsion_b = batch(torsion_groups, 3)

    def energy_fn(x: jax.Array) -> jax.Array:
        xt = x.astype(jnp.float32).T                     # (3, N)
        R = jnp.stack(
            [xt if d == 0 else jnp.roll(xt, -d, axis=1)
             for d in all_deltas]
        )                                                # (D, 3, N)
        e = jnp.zeros((), jnp.float32)

        if bond_b is not None:
            idxs, mask, (k, r0) = bond_b
            dx = xt[None] - R[idxs[0]]                   # (G, 3, N)
            r = jnp.sqrt(jnp.sum(dx * dx, axis=1) + _EPS)  # (G, N)
            e = e + jnp.sum(mask * 0.5 * k * (r - r0) ** 2)

        if angle_b is not None:
            idxs, mask, (k, t0) = angle_b
            b = R[idxs[0]]
            v1 = xt[None] - b
            v2 = R[idxs[1]] - b
            cos_t = jnp.sum(v1 * v2, axis=1) / jnp.sqrt(
                jnp.sum(v1 * v1, axis=1) * jnp.sum(v2 * v2, axis=1) + _EPS
            )
            theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
            e = e + jnp.sum(mask * 0.5 * k * (theta - t0) ** 2)

        if torsion_b is not None:
            idxs, mask, (k, per, phase) = torsion_b
            p1, p2, p3 = R[idxs[0]], R[idxs[1]], R[idxs[2]]
            b0 = p1 - xt[None]
            b1 = p2 - p1
            b2 = p3 - p2
            n1 = jnp.cross(b0, b1, axis=1)
            n2 = jnp.cross(b1, b2, axis=1)
            b1n = b1 / jnp.sqrt(
                jnp.sum(b1 * b1, axis=1, keepdims=True) + _EPS
            )
            cx = jnp.sum(n1 * n2, axis=1)                # (G, N)
            cy = jnp.sum(jnp.cross(n1, n2, axis=1) * b1n, axis=1)
            # masked lanes hold arbitrary geometry; atan2(0, 0) has a NaN
            # gradient and 0 * NaN would poison the sum — pin those lanes
            on = mask > 0
            phi = jnp.arctan2(
                jnp.where(on, cy, 0.0), jnp.where(on, cx, 1.0)
            )
            e = e + jnp.sum(mask * k * (1.0 + jnp.cos(per * phi - phase)))

        return e

    return energy_fn


__all__ = ["build_rolled_bonded"]
