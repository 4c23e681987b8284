"""(Well-tempered) metadynamics in CV space with a static-shaped hills ledger.

Rebuild of the mechanism prototyped in the reference's active-bias example
(example_programs/14_muller_brown_active_bias.py:377-460: hills ledger in
CV space with reprojection on retrain). TPU-first design: the ledger is a
fixed-capacity array pytree (centers/heights/valid-count), so both the bias
energy and hill deposition are jittable and the entire biased MD loop stays
in one XLA program. Reweighting uses the standard e^{beta V} factors.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOLTZMANN_CONSTANT_KJ_PER_MOL


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MetaDState:
    """Hills ledger: fixed capacity, ``n_hills`` marks the valid prefix."""

    centers: jax.Array   # (H_max, n_cv)
    heights: jax.Array   # (H_max,)
    n_hills: jax.Array   # () int32


@dataclasses.dataclass(frozen=True)
class MetadynamicsBias:
    """Gaussian-hills bias with optional well-tempered height damping.

    Parameters mirror PLUMED conventions: ``height`` (kJ/mol), ``sigma``
    per-CV widths, ``bias_factor`` gamma (None -> standard metadynamics),
    ``temperature_K`` for well-tempered damping.
    """

    sigma: Tuple[float, ...]
    height: float = 1.0
    max_hills: int = 4096
    bias_factor: Optional[float] = None     # gamma > 1 for well-tempered
    temperature_K: float = 300.0

    def init_state(self, n_cv: Optional[int] = None) -> MetaDState:
        n_cv = n_cv or len(self.sigma)
        return MetaDState(
            centers=jnp.zeros((self.max_hills, n_cv), dtype=jnp.float32),
            heights=jnp.zeros(self.max_hills, dtype=jnp.float32),
            n_hills=jnp.asarray(0, dtype=jnp.int32),
        )

    def energy(self, state: MetaDState, cv: jax.Array) -> jax.Array:
        """Bias energy at a CV point: masked sum over deposited hills."""
        sigma = jnp.asarray(self.sigma, dtype=cv.dtype)
        d = (cv[None, :] - state.centers) / sigma[None, :]
        g = jnp.exp(-0.5 * jnp.sum(d * d, axis=1))
        mask = (
            jnp.arange(self.max_hills) < state.n_hills
        ).astype(cv.dtype)
        return jnp.sum(state.heights * g * mask)

    def deposit(self, state: MetaDState, cv: jax.Array) -> MetaDState:
        """Add one hill at ``cv`` (well-tempered damping if configured).

        Jittable: writes at index ``n_hills`` (saturates at capacity —
        deposits beyond ``max_hills`` are dropped, matching a full ledger).
        """
        h = jnp.asarray(self.height, dtype=cv.dtype)
        if self.bias_factor is not None:
            if self.bias_factor <= 1.0:
                raise ValueError("bias_factor must be > 1")
            kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * self.temperature_K
            delta_T = (self.bias_factor - 1.0) * self.temperature_K
            v_here = self.energy(state, cv)
            h = h * jnp.exp(
                -v_here / (BOLTZMANN_CONSTANT_KJ_PER_MOL * delta_T)
            )
        idx = jnp.minimum(state.n_hills, self.max_hills - 1)
        in_capacity = state.n_hills < self.max_hills
        centers = state.centers.at[idx].set(
            jnp.where(in_capacity, cv, state.centers[idx])
        )
        heights = state.heights.at[idx].set(
            jnp.where(in_capacity, h, state.heights[idx])
        )
        return MetaDState(
            centers=centers,
            heights=heights,
            n_hills=state.n_hills + in_capacity.astype(jnp.int32),
        )

    def bias_fn(
        self,
        state: MetaDState,
        cv_from_positions: Callable[[jax.Array], jax.Array],
    ) -> Callable[[jax.Array], jax.Array]:
        """positions -> metadynamics energy (closure over a fixed ledger)."""

        def fn(positions: jax.Array) -> jax.Array:
            return self.energy(state, cv_from_positions(positions))

        return fn

    def reproject(
        self,
        state: MetaDState,
        old_to_new_cv: Callable[[jax.Array], jax.Array],
    ) -> MetaDState:
        """Map hill centers through a new CV model after retraining
        (reference 14_muller_brown_active_bias.py reprojection step).

        NOTE: valid only when the stored centers live in the function's
        INPUT space. When centers were deposited in a previous CV space,
        reproject from the hills' configuration-space anchors instead
        (``set_centers`` with centers recomputed as new_cv(anchor)).
        """
        new_centers = jax.vmap(old_to_new_cv)(state.centers)
        return self.set_centers(state, new_centers)

    def set_centers(self, state: MetaDState, new_centers) -> MetaDState:
        """Replace hill centers (heights/count preserved) — the anchor-based
        reprojection path: centers recomputed as new_cv(deposit anchors)."""
        new_centers = jnp.asarray(new_centers)
        if new_centers.shape != state.centers.shape:
            raise ValueError(
                f"need centers of shape {state.centers.shape} "
                f"(all ledger slots), got {new_centers.shape}"
            )
        return MetaDState(
            centers=new_centers.astype(state.centers.dtype),
            heights=state.heights,
            n_hills=state.n_hills,
        )

    def reweighting_factors(
        self, state: MetaDState, cvs: jax.Array, temperature_K: Optional[float] = None
    ) -> np.ndarray:
        """w_i proportional to exp(+V_bias(cv_i)/kT) for unbiasing histograms."""
        T = temperature_K or self.temperature_K
        kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * T
        v = jax.vmap(lambda c: self.energy(state, c))(jnp.asarray(cvs))
        v = v - jnp.max(v)
        return np.asarray(jnp.exp(v / kT))


__all__ = ["MetadynamicsBias", "MetaDState"]
