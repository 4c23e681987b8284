"""Public API facade: ~40 re-exported functions
(reference: src/pmarlo/api/__init__.py:16-51)."""

from .features import (
    compute_features,
    compute_universal_metric,
    compute_universal_embedding,
    align_trajectory,
    trig_expand_periodic,
    clear_feature_cache,
)
from .msm import (
    analyze_msm,
    build_msm_from_labels,
    compute_macrostates,
    macrostate_populations,
    macrostate_transition_matrix,
    macrostate_mfpt,
)
from .fes import select_fes_pair, generate_fes_and_pick_minima
from .conformations import (
    conformations_to_csv,
    conformations_to_json,
)
from .clustering import cluster_microstates
from .feature_profiles import FEATURE_PROFILES, get_feature_profile
from .trajectory_utils import extract_last_frame_to_pdb

__all__ = [
    "cluster_microstates",
    "compute_features",
    "compute_universal_metric",
    "compute_universal_embedding",
    "align_trajectory",
    "trig_expand_periodic",
    "clear_feature_cache",
    "analyze_msm",
    "build_msm_from_labels",
    "compute_macrostates",
    "macrostate_populations",
    "macrostate_transition_matrix",
    "macrostate_mfpt",
    "select_fes_pair",
    "generate_fes_and_pick_minima",
    "conformations_to_csv",
    "conformations_to_json",
    "FEATURE_PROFILES",
    "get_feature_profile",
    "extract_last_frame_to_pdb",
]
