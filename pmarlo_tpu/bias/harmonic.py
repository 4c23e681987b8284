"""Harmonic-expansion bias: E = k * sum(cv^2).

Reference: src/pmarlo/features/deeptica/cv_bias_potential.py:25-152
(HarmonicExpansionBias + CVBiasPotential.forward: extract features -> scale
-> DeepTICA CVs -> E = k sum cv^2, forces by autodiff). Here the whole
chain is one closure over jittable functions.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401 - used by make_phi_psi_feature_fn


@dataclasses.dataclass(frozen=True)
class HarmonicExpansionBias:
    """E(cv) = strength * sum_i cv_i^2 — pushes sampling outward along the
    learned slow modes (the reference's exploration bias)."""

    strength: float = 1.0  # kJ/mol per cv^2 unit

    def __call__(self, cv: jax.Array) -> jax.Array:
        return self.strength * jnp.sum(cv * cv)


def make_cv_bias_fn(
    cv_from_positions: Callable[[jax.Array], jax.Array],
    bias_on_cv: Callable[[jax.Array], jax.Array],
) -> Callable[[jax.Array], jax.Array]:
    """Compose positions -> CV -> bias energy into one function.

    ``cv_from_positions`` maps (N, 3) positions to (n_cv,) CVs — typically
    ``features -> scaler -> DeepTICAModel.as_function()`` — and
    ``bias_on_cv`` maps CVs to a scalar energy. The result plugs into
    ``potential_energy(system, x, bias_fn=...)``; OpenMM's TorchForce and
    the finite-difference force validation it required
    (tests/force/test_fd_vs_torchforce.py) reduce to jax.grad correctness.
    """

    def bias_fn(positions: jax.Array) -> jax.Array:
        return bias_on_cv(cv_from_positions(positions))

    return bias_fn


def make_feature_cv_fn(
    feature_fn: Callable[[jax.Array], jax.Array],
    model_fn: Callable[[jax.Array], jax.Array],
) -> Callable[[jax.Array], jax.Array]:
    """positions (N,3) -> features (K,) -> cv (n_out,).

    ``feature_fn`` is a single-frame feature kernel (e.g. dihedrals via
    features.builtins on ``positions[None]``); ``model_fn`` is
    ``DeepTICAModel.as_function()`` (scaler + MLP + whitening inside).
    """

    def cv_fn(positions: jax.Array) -> jax.Array:
        feats = feature_fn(positions)
        return model_fn(feats.reshape(1, -1))[0]

    return cv_fn


def make_phi_psi_feature_fn(
    atom_names: Sequence[str],
    residue_ids: Sequence[int],
    cos_sin: bool = True,
    chain_ids: Optional[Sequence[str]] = None,
):
    """Single-frame phi/psi feature function for CV bias composition.

    Returns ``feature_fn(positions (N, 3)) -> (K,)`` with K = 2*n_dihedrals
    when ``cos_sin`` (the bias-safe smooth embedding) else n_dihedrals.
    This is the in-graph replacement for the reference's TorchScript
    feature extractor (ts_feature_extractor.py:311).
    """
    from ..features.builtins import phi_psi_indices
    from ..md.forces import dihedral_angles

    phi_q, psi_q, _ = phi_psi_indices(atom_names, residue_ids, chain_ids)
    quads = jnp.asarray(np.concatenate([phi_q, psi_q], axis=0))
    if quads.shape[0] == 0:
        raise ValueError("system has no phi/psi dihedrals for a CV bias")

    def feature_fn(positions: jax.Array) -> jax.Array:
        angles = dihedral_angles(positions, quads)
        if cos_sin:
            return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)])
        return angles

    return feature_fn


__all__ = [
    "HarmonicExpansionBias",
    "make_cv_bias_fn",
    "make_feature_cv_fn",
    "make_phi_psi_feature_fn",
]
