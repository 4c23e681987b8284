"""On-device featurization: dihedrals, distances, Rg, contacts, registry.

Replaces the reference's mdtraj-backed feature layer
(src/pmarlo/features/base.py, builtins.py, featurize.py) with JAX kernels
over device-resident coordinate buffers — features compose into the MD
graph, so CV bias needs no extraction bridge.
"""

from .base import (
    FEATURE_REGISTRY,
    FeatureSpec,
    get_feature,
    parse_feature_spec,
    register_feature,
)
from .builtins import (
    compute_dihedrals,
    compute_distances,
    compute_angles,
    phi_psi_indices,
    chi1_indices,
    radius_of_gyration,
    contacts,
)
from .featurize import featurize_trajectory
from .structure import (
    shrake_rupley_sasa,
    hydrogen_bonds,
    ss_fractions,
    ss_fractions_dssp,
    dssp,
    kabsch_sander_hbonds,
    baker_hubbard,
)
from .pairs import lagged_time_pairs, make_training_pairs_from_trajectory
from .ramachandran import compute_ramachandran, compute_ramachandran_fes, periodic_hist2d
from .rdf import radial_distribution, coordination_number
from .msd import (
    diffusion_coefficient,
    mean_squared_displacement,
    unwrap_trajectory,
)

__all__ = [
    "FEATURE_REGISTRY",
    "FeatureSpec",
    "get_feature",
    "parse_feature_spec",
    "register_feature",
    "compute_dihedrals",
    "compute_distances",
    "compute_angles",
    "phi_psi_indices",
    "chi1_indices",
    "radius_of_gyration",
    "contacts",
    "featurize_trajectory",
    "lagged_time_pairs",
    "make_training_pairs_from_trajectory",
    "compute_ramachandran",
    "compute_ramachandran_fes",
    "periodic_hist2d",
    "radial_distribution",
    "coordination_number",
    "mean_squared_displacement",
    "diffusion_coefficient",
    "unwrap_trajectory",
]
