"""Learned collective variables: DeepTICA MLPs trained with VAMP-2 in JAX.

Replaces the reference's torch/lightning/mlcolvar stack
(src/pmarlo/features/deeptica/, src/pmarlo/ml/deeptica/). The trained CV is
a plain JAX function, so bias energies compose directly into the MD graph —
the entire TorchScript/openmm-torch export layer is obsolete by
construction (SURVEY.md section 2b).
"""

from .deeptica import DeepTICAConfig, DeepTICAModel, train_deeptica
from .losses import vamp2_loss
from .whitening import apply_output_transform

__all__ = [
    "DeepTICAConfig",
    "DeepTICAModel",
    "train_deeptica",
    "vamp2_loss",
    "apply_output_transform",
]
