"""Feature API: cached featurization, universal metric, alignment.

Reference: src/pmarlo/api/features.py — compute_features with content-hash
feature cache (:27-75, :192), compute_universal_metric/_embedding
(:345,:423), align_trajectory (:110), trig_expand_periodic (:138).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..features.base import TopologyInfo
from ..features.builtins import align_to_reference
from ..features.builtins import trig_expand_periodic as _trig_expand
from ..features.featurize import featurize_trajectory
from ..msm.reduction import pca

_FEATURE_CACHE: Dict[str, Tuple[np.ndarray, Dict]] = {}
_CACHE_LIMIT = 32


def _content_hash(traj: np.ndarray, spec, top: TopologyInfo) -> str:
    """Content hash over coordinates + spec + topology names
    (reference api/features.py:27-75)."""
    h = hashlib.sha256()
    arr = np.ascontiguousarray(np.asarray(traj, dtype=np.float32))
    h.update(arr.shape.__repr__().encode())
    h.update(arr[:: max(len(arr) // 64, 1)].tobytes())  # strided content sample
    h.update(str(spec).encode())
    h.update(",".join(top.atom_names).encode())
    return h.hexdigest()


def compute_features(
    traj,
    spec: "str | Sequence[str]",
    top: TopologyInfo,
    *,
    cos_sin_expand: bool = False,
    use_cache: bool = True,
) -> Tuple[np.ndarray, Dict]:
    """Featurize with an in-process content-hash cache
    (reference api/features.py:192)."""
    traj = np.asarray(traj)
    key = _content_hash(traj, (spec, cos_sin_expand), top) if use_cache else None
    if key is not None and key in _FEATURE_CACHE:
        return _FEATURE_CACHE[key]
    X, info = featurize_trajectory(traj, spec, top, cos_sin_expand=cos_sin_expand)
    X = np.asarray(X)
    if key is not None:
        if len(_FEATURE_CACHE) >= _CACHE_LIMIT:
            _FEATURE_CACHE.pop(next(iter(_FEATURE_CACHE)))
        _FEATURE_CACHE[key] = (X, info)
    return X, info


def clear_feature_cache() -> None:
    _FEATURE_CACHE.clear()


def align_trajectory(traj, reference=None) -> np.ndarray:
    """Kabsch-align all frames onto a reference (default: first frame)
    (reference api/features.py:110)."""
    traj = np.asarray(traj)
    ref = np.asarray(reference) if reference is not None else traj[0]
    import jax.numpy as jnp

    return np.asarray(align_to_reference(jnp.asarray(traj), jnp.asarray(ref)))


def trig_expand_periodic(X) -> np.ndarray:
    """(reference api/features.py:138)."""
    import jax.numpy as jnp

    return np.asarray(_trig_expand(jnp.asarray(np.asarray(X))))


def compute_universal_metric(
    traj, top: TopologyInfo, *, n_components: int = 1
) -> np.ndarray:
    """A single scalar 'universal' progress metric per frame: first PC of
    the pooled standard feature set (reference api/features.py:345)."""
    emb = compute_universal_embedding(traj, top, n_components=n_components)
    return emb[:, 0]


def compute_universal_embedding(
    traj, top: TopologyInfo, *, n_components: int = 2
) -> np.ndarray:
    """PCA embedding of the pooled universal features (phi/psi cos-sin + Rg
    + CA distances) (reference api/features.py:423)."""
    blocks = []
    try:
        X, _ = compute_features(traj, "phi_psi", top, cos_sin_expand=True)
        blocks.append(X)
    except (ValueError, KeyError):
        pass
    try:
        X, _ = compute_features(traj, "rg", top)
        blocks.append(X)
    except (ValueError, KeyError):
        pass
    try:
        X, _ = compute_features(traj, "ca_distances", top)
        blocks.append(X)
    except (ValueError, KeyError):
        pass
    if not blocks:
        raise ValueError("no universal features computable for this system")
    pooled = np.concatenate(blocks, axis=1)
    mu, sd = pooled.mean(0), pooled.std(0)
    sd[sd < 1e-12] = 1.0
    model = pca((pooled - mu) / sd, n_components=n_components)
    return model.transform((pooled - mu) / sd)


__all__ = [
    "compute_features",
    "clear_feature_cache",
    "align_trajectory",
    "trig_expand_periodic",
    "compute_universal_metric",
    "compute_universal_embedding",
]
