"""CV bias potentials that fuse into the MD energy graph.

Replaces the reference's TorchScript bias stack
(src/pmarlo/features/deeptica/cv_bias_potential.py:54,
ts_feature_extractor.py:311, openmm_integration.py:189): here a bias is a
plain function ``bias_fn(positions) -> energy`` composed into
``potential_energy``; forces come from the same ``jax.grad`` as the
physical forces — one fused XLA program, no bridge layer.
"""

from .harmonic import HarmonicExpansionBias, make_cv_bias_fn
from .metadynamics import MetadynamicsBias, MetaDState

__all__ = [
    "HarmonicExpansionBias",
    "make_cv_bias_fn",
    "MetadynamicsBias",
    "MetaDState",
]
