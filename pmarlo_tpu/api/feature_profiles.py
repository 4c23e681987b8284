"""Named feature profiles with CV-biasing compatibility validation
(reference: src/pmarlo/api/feature_profiles.py:36-178)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple


@dataclasses.dataclass(frozen=True)
class FeatureProfile:
    name: str
    spec: Tuple[str, ...]
    description: str
    bias_compatible: bool     # usable inside the per-step CV bias graph
    periodic_only: bool = False


FEATURE_PROFILES: Dict[str, FeatureProfile] = {
    p.name: p
    for p in [
        FeatureProfile(
            name="backbone",
            spec=("phi_psi",),
            description="Backbone phi/psi dihedrals (cos/sin expandable)",
            bias_compatible=True,
            periodic_only=True,
        ),
        FeatureProfile(
            name="backbone_chi1",
            spec=("phi_psi", "chi1"),
            description="Backbone + chi1 side-chain dihedrals",
            bias_compatible=True,
            periodic_only=True,
        ),
        FeatureProfile(
            name="compactness",
            spec=("rg", "ca_distances"),
            description="Radius of gyration + CA pair distances",
            bias_compatible=True,
        ),
        FeatureProfile(
            name="contacts",
            spec=("contacts",),
            description="Smooth CA contact indicators",
            bias_compatible=True,
        ),
        FeatureProfile(
            name="universal",
            spec=("phi_psi", "rg", "ca_distances"),
            description="Pooled universal metric feature set",
            bias_compatible=False,  # mixed periodicity; analysis only
        ),
    ]
}


def get_feature_profile(name: str, for_bias: bool = False) -> FeatureProfile:
    """Look up a profile; with ``for_bias`` reject analysis-only profiles
    (the reference's CV-biasing compatibility validation)."""
    key = name.lower()
    if key not in FEATURE_PROFILES:
        raise KeyError(
            f"unknown feature profile {name!r}; available: {sorted(FEATURE_PROFILES)}"
        )
    profile = FEATURE_PROFILES[key]
    if for_bias and not profile.bias_compatible:
        raise ValueError(
            f"profile {name!r} is not CV-bias compatible "
            "(mixed/discontinuous features cannot drive per-step bias forces)"
        )
    return profile


__all__ = ["FeatureProfile", "FEATURE_PROFILES", "get_feature_profile"]
