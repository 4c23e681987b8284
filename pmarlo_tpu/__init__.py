"""pmarlo_tpu — TPU-native molecular sampling + Markov-state-model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Komputerowe-Projektowanie-Lekow/pmarlo``: protein prep, Langevin MD with
temperature replica exchange (vmapped replicas, on-device swap collectives),
learned collective variables (DeepTICA / VAMP-2) whose bias forces are
``jax.grad`` of an in-graph energy, shard-based trajectory datasets, and a
full estimation stack (featurization, TICA/VAMP, k-means, MSM estimation,
ITS, CK validation, FES, PCCA+, TPT conformations).

Public symbols are lazily resolved (reference pattern:
src/pmarlo/__init__.py:18-38,100) so importing the package stays cheap.
"""

from __future__ import annotations

import importlib
from typing import Any

__version__ = "0.1.0"

# symbol -> (module, attr)
_EXPORTS = {
    # settings / utils
    "load_defaults": ("pmarlo_tpu.settings", "load_defaults"),
    "set_global_seed": ("pmarlo_tpu.utils.seed", "set_global_seed"),
    "constants": ("pmarlo_tpu.constants", None),
    "api": ("pmarlo_tpu.api", None),
    "visualization": ("pmarlo_tpu.visualization", None),
    # structure prep
    "Protein": ("pmarlo_tpu.protein.protein", "Protein"),
    "solvate_structure": ("pmarlo_tpu.protein.solvate", "solvate_structure"),
    "repair_missing_atoms": ("pmarlo_tpu.protein.repair",
                             "repair_missing_atoms"),
    # MD core
    "System": ("pmarlo_tpu.md.system", "System"),
    "MDState": ("pmarlo_tpu.md.integrate", "MDState"),
    "build_system": ("pmarlo_tpu.md.forcefield", "build_system"),
    "run_segment": ("pmarlo_tpu.md.simulation", "run_segment"),
    "build_pair_force_fn": ("pmarlo_tpu.md.pallas_pair",
                            "build_pair_force_fn"),
    "build_periodic_force_fn": ("pmarlo_tpu.md.pallas_periodic",
                                "build_periodic_force_fn"),
    "build_h_constraints": ("pmarlo_tpu.md.constraints",
                            "build_h_constraints"),
    "build_cell_force_fn": ("pmarlo_tpu.md.pallas_cells",
                            "build_cell_force_fn"),
    "ewald_energy_dense": ("pmarlo_tpu.md.pme", "ewald_energy_dense"),
    "run_npt": ("pmarlo_tpu.md.barostat", "run_npt"),
    # REMD
    "RemdConfig": ("pmarlo_tpu.remd.remd", "RemdConfig"),
    "ReplicaExchange": ("pmarlo_tpu.remd.remd", "ReplicaExchange"),
    "run_replica_exchange": ("pmarlo_tpu.remd.remd", "run_replica_exchange"),
    "suggest_temperature_ladder": ("pmarlo_tpu.remd.ladder",
                                   "suggest_temperature_ladder"),
    # dashboard (reference pmarlo_webapp)
    "export_dashboard": ("pmarlo_tpu.webapp", "export_static"),
    "serve_dashboard": ("pmarlo_tpu.webapp", "serve"),
    # features
    "FEATURE_REGISTRY": ("pmarlo_tpu.features.base", "FEATURE_REGISTRY"),
    "get_feature": ("pmarlo_tpu.features.base", "get_feature"),
    "register_feature": ("pmarlo_tpu.features.base", "register_feature"),
    "parse_feature_spec": ("pmarlo_tpu.features.base", "parse_feature_spec"),
    "featurize_trajectory": ("pmarlo_tpu.features.featurize", "featurize_trajectory"),
    "compute_ramachandran": ("pmarlo_tpu.features.ramachandran", "compute_ramachandran"),
    "dssp": ("pmarlo_tpu.features.structure", "dssp"),
    "ss_fractions_dssp": ("pmarlo_tpu.features.structure", "ss_fractions_dssp"),
    "baker_hubbard": ("pmarlo_tpu.features.structure", "baker_hubbard"),
    # ML CVs
    "DeepTICAConfig": ("pmarlo_tpu.ml.deeptica", "DeepTICAConfig"),
    "DeepTICAModel": ("pmarlo_tpu.ml.deeptica", "DeepTICAModel"),
    "train_deeptica": ("pmarlo_tpu.ml.deeptica", "train_deeptica"),
    # MSM
    "MarkovStateModel": ("pmarlo_tpu.msm.enhanced", "EnhancedMSM"),
    "EnhancedMSM": ("pmarlo_tpu.msm.enhanced", "EnhancedMSM"),
    "run_complete_msm_analysis": ("pmarlo_tpu.msm.enhanced", "run_complete_msm_analysis"),
    "generate_2d_fes": ("pmarlo_tpu.msm.free_energy", "generate_2d_fes"),
    "generate_1d_pmf": ("pmarlo_tpu.msm.free_energy", "generate_1d_pmf"),
    "FESResult": ("pmarlo_tpu.msm.free_energy", "FESResult"),
    "PMFResult": ("pmarlo_tpu.msm.free_energy", "PMFResult"),
    "candidate_lag_ladder": ("pmarlo_tpu.utils.msm_utils",
                             "candidate_lag_ladder"),
    # shards
    "write_shard": ("pmarlo_tpu.io.shards", "write_shard"),
    "read_shard": ("pmarlo_tpu.io.shards", "read_shard"),
    "select_shard_paths": ("pmarlo_tpu.io.shards", "select_shard_paths"),
    # conformations
    "find_conformations": ("pmarlo_tpu.conformations.finder", "find_conformations"),
    # fused enhanced sampling
    "run_fused_metadynamics": (
        "pmarlo_tpu.md.enhanced_sampling", "run_fused_metadynamics"
    ),
    "MetadynamicsBias": ("pmarlo_tpu.bias.metadynamics", "MetadynamicsBias"),
    "train_cv_model": ("pmarlo_tpu.cv", "train_cv_model"),
    "Pipeline": ("pmarlo_tpu.workflow", "Pipeline"),
    "save_checkpoint": ("pmarlo_tpu.remd.checkpoint", "save_checkpoint"),
    "load_checkpoint": ("pmarlo_tpu.remd.checkpoint", "load_checkpoint"),
}


def __getattr__(name: str) -> Any:
    try:
        module_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'pmarlo_tpu' has no attribute {name!r}")
    module = importlib.import_module(module_name)
    return module if attr is None else getattr(module, attr)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))


def get_version() -> str:
    return __version__


def get_info() -> dict:
    import jax

    return {
        "version": __version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
