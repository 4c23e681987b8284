"""Shard-parallel reductions: counts, covariances, histograms over a mesh.

Implements the SURVEY section-2c/5 "distributed communication backend"
plan: estimation-stage sums (transition-count merges, streaming TICA
covariance moments, FES histograms) run as ``shard_map`` bodies with
``psum`` over the mesh axis — XLA lowers the reduction onto ICI within a
slice and DCN across slices, with no host round-trips per shard.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _put_sharded(arr: jax.Array, mesh: Mesh, axis: str) -> jax.Array:
    return jax.device_put(
        arr, NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
    )


def sharded_transition_counts(
    dtrajs: jax.Array,          # (S, T) padded label matrix, -1 = invalid
    lag: int,
    n_states: int,
    mesh: Mesh,
    axis: str = "shard",
) -> np.ndarray:
    """Count matrix over shard-sharded label rows with an on-device psum.

    Each device counts its local shard rows (segment-safe: rows never mix),
    then a single ``psum`` merges the (n, n) partial counts over ICI.
    """
    dtrajs = _put_sharded(jnp.asarray(dtrajs, dtype=jnp.int32), mesh, axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(axis, None), out_specs=P(),
    )
    def count(local):                  # (S_local, T)
        s = local[:, :-lag]
        t = local[:, lag:]
        valid = (s >= 0) & (t >= 0) & (s < n_states) & (t < n_states)
        flat = jnp.where(valid, s * n_states + t, 0).reshape(-1)
        w = valid.reshape(-1).astype(jnp.float32)
        c = jax.ops.segment_sum(w, flat, num_segments=n_states * n_states)
        c = c.reshape(n_states, n_states)
        return jax.lax.psum(c, axis)

    return np.asarray(count(dtrajs), dtype=np.float64)


def sharded_covariance_moments(
    X: jax.Array,               # (S, T, K) shard-sharded feature tensor
    lag: int,
    mesh: Mesh,
    axis: str = "shard",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Streaming TICA moments over a mesh: per-device partial sums of
    (C00, C0t, Ctt, s0, st, n) followed by one psum each.

    Feeds msm.reduction's generalized eigensolves — the BASELINE.json
    "streaming TICA covariances ... no host round-trips per shard" path.
    """
    X = _put_sharded(jnp.asarray(X, dtype=jnp.float32), mesh, axis)
    K = X.shape[-1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(axis, None, None), out_specs=(P(), P(), P(), P(), P(), P()),
    )
    def moments(local):                # (S_local, T, K)
        X0 = local[:, :-lag, :].reshape(-1, K)
        Xt = local[:, lag:, :].reshape(-1, K)
        C00 = X0.T @ X0
        C0t = X0.T @ Xt
        Ctt = Xt.T @ Xt
        s0 = jnp.sum(X0, axis=0)
        st = jnp.sum(Xt, axis=0)
        n = jnp.asarray(X0.shape[0], jnp.float32)
        return tuple(
            jax.lax.psum(v, axis) for v in (C00, C0t, Ctt, s0, st, n)
        )

    C00, C0t, Ctt, s0, st, n = moments(X)
    n = int(n)
    mean0 = np.asarray(s0, np.float64) / n
    meant = np.asarray(st, np.float64) / n
    C00 = np.asarray(C00, np.float64) / n - np.outer(mean0, mean0)
    C0t = np.asarray(C0t, np.float64) / n - np.outer(mean0, meant)
    Ctt = np.asarray(Ctt, np.float64) / n - np.outer(meant, meant)
    return C00, C0t, Ctt, mean0, meant, n


def sharded_histogram(
    values: jax.Array,          # (S, T) shard-sharded scalar series
    edges: np.ndarray,
    mesh: Mesh,
    axis: str = "shard",
    weights: Optional[jax.Array] = None,
) -> np.ndarray:
    """1D histogram accumulated per device then psum-merged."""
    values = _put_sharded(jnp.asarray(values, dtype=jnp.float32), mesh, axis)
    edges_j = jnp.asarray(edges, dtype=jnp.float32)
    n_bins = len(edges) - 1
    if weights is not None:
        weights = _put_sharded(jnp.asarray(weights, dtype=jnp.float32), mesh, axis)

    in_specs = (P(axis, None),) if weights is None else (P(axis, None), P(axis, None))

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=P())
    def hist(local, *maybe_w):
        flat = local.reshape(-1)
        idx = jnp.clip(jnp.searchsorted(edges_j, flat) - 1, 0, n_bins - 1)
        in_range = (flat >= edges_j[0]) & (flat <= edges_j[-1])
        w = maybe_w[0].reshape(-1) if maybe_w else jnp.ones_like(flat)
        w = jnp.where(in_range, w, 0.0)
        h = jax.ops.segment_sum(w, idx, num_segments=n_bins)
        return jax.lax.psum(h, axis)

    args = (values,) if weights is None else (values, weights)
    return np.asarray(hist(*args), dtype=np.float64)


__all__ = [
    "sharded_transition_counts",
    "sharded_covariance_moments",
    "sharded_histogram",
]
