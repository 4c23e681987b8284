"""Dataset-level analysis over shard collections.

Rebuild of src/pmarlo/analysis/: discretization with schema validation and
pair accounting (discretize.py:901), whitening-aware MSM prep (msm.py:53),
CV projection (project_cv.py:15), FES input prep (fes.py:20), pre-build
debug export (debug_export.py:50), autocorrelation diagnostics
(diagnostics.py:585).
"""

from .discretize import (
    GridDiscretizer,
    MSMDiscretizationResult,
    discretize_dataset,
)
from .msm import prepare_msm_discretization, ensure_msm_inputs_whitened
from .project_cv import apply_whitening_from_metadata
from .counting import expected_pairs
from .validation import validate_features
from .debug_export import (
    AnalysisDebugData,
    compute_analysis_debug,
    export_analysis_debug,
)
from .diagnostics import compute_diagnostics, derive_taus
from .fes import compute_kde_fes, fes_from_dataset

__all__ = [
    "MSMDiscretizationResult",
    "discretize_dataset",
    "prepare_msm_discretization",
    "ensure_msm_inputs_whitened",
    "apply_whitening_from_metadata",
    "expected_pairs",
    "validate_features",
    "compute_analysis_debug",
    "export_analysis_debug",
    "AnalysisDebugData",
    "compute_diagnostics",
    "derive_taus",
    "compute_kde_fes",
    "fes_from_dataset",
    "GridDiscretizer",
]
