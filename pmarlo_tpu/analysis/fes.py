"""FES input preparation over datasets
(reference: src/pmarlo/analysis/fes.py:20 highest-variance CV selection,
:91 weight normalization + ESS)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..msm.free_energy import FESResult, generate_2d_fes


def select_fes_columns(X: np.ndarray, n: int = 2) -> Tuple[int, ...]:
    """Pick the n highest-variance CV columns (reference fes.py:20)."""
    X = np.asarray(X)
    var = X.var(axis=0)
    order = np.argsort(var)[::-1]
    return tuple(int(i) for i in order[:n])


def normalize_weights(
    weights: Optional[np.ndarray], n: int
) -> Tuple[np.ndarray, float]:
    """Normalized weights + effective sample size (reference fes.py:91)."""
    if weights is None:
        return np.full(n, 1.0 / n), float(n)
    w = np.asarray(weights, dtype=np.float64)
    if w.shape[0] != n:
        raise ValueError(f"weights length {w.shape[0]} != {n}")
    if (w < 0).any():
        raise ValueError("weights must be non-negative")
    total = w.sum()
    if total <= 0:
        raise ValueError("weights sum to zero")
    w = w / total
    ess = float(1.0 / np.sum(w * w))
    return w, ess


def fes_from_dataset(
    dataset: Sequence[Dict],
    *,
    temperature_K: float = 300.0,
    columns: Optional[Tuple[int, int]] = None,
    weights_key: str = "weights",
    bins: Optional[int] = None,
    smoothing_mode: str = "auto",
) -> FESResult:
    """Pool shard features (and per-frame weights if present) into one FES."""
    feats, weights, have_weights = [], [], False
    for shard in dataset:
        X = np.asarray(shard["features"] if isinstance(shard, dict) else shard)
        feats.append(X)
        if isinstance(shard, dict) and weights_key in shard:
            weights.append(np.asarray(shard[weights_key]))
            have_weights = True
        else:
            weights.append(np.ones(X.shape[0]))
    X = np.concatenate(feats, axis=0)
    w = np.concatenate(weights) if have_weights else None
    if columns is None:
        columns = select_fes_columns(X, 2)
    c1, c2 = columns
    if w is not None:
        w, _ = normalize_weights(w, X.shape[0])
    return generate_2d_fes(
        X[:, c1], X[:, c2], temperature_K=temperature_K, bins=bins,
        weights=w, smoothing_mode=smoothing_mode,
        cv_names=(f"CV{c1}", f"CV{c2}"),
    )


__all__ = ["select_fes_columns", "normalize_weights", "fes_from_dataset"]
