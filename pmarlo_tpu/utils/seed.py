"""Deterministic seeding across python/numpy/JAX.

(Reference: src/pmarlo/utils/seed.py:19,41,79 — python/numpy/torch seeding;
here the third leg is a JAX PRNG key rather than torch's global state, which
is the idiomatic functional equivalent.)
"""

from __future__ import annotations

import random
from typing import Any, Mapping, Optional

import numpy as np


def set_global_seed(seed: int) -> "jax.Array":  # noqa: F821
    """Seed python and numpy RNGs and return a JAX PRNG key for the rest.

    JAX has no global RNG; the returned key is the root of the run's key
    tree. All device-side randomness must derive from it via
    ``jax.random.split``/``fold_in`` so runs are exactly reproducible.
    """
    if not isinstance(seed, (int, np.integer)):
        raise TypeError(f"seed must be an int, got {type(seed)!r}")
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    import jax

    return jax.random.PRNGKey(seed)


def choose_sim_seed(config_seed: Optional[int] = None) -> int:
    """Pick a simulation seed: explicit config wins, else random 31-bit."""
    if config_seed is not None:
        return int(config_seed)
    return int(np.random.SeedSequence().entropy % (2**31 - 1))


def extract_seed(obj: Any, default: Optional[int] = None) -> Optional[int]:
    """Pull a seed out of a config-ish object (attr or mapping key)."""
    if obj is None:
        return default
    if isinstance(obj, Mapping) and "seed" in obj:
        value = obj["seed"]
    else:
        value = getattr(obj, "seed", default)
    if value is None:
        return default
    return int(value)
