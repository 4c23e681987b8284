"""Shared utilities (seeding, thermodynamics, MSM helpers, IO helpers)."""

from .seed import set_global_seed, choose_sim_seed, extract_seed
from .thermodynamics import kT_kJ_per_mol, beta_per_kJ_mol
from .errors import PmarloError, TemperatureConsistencyError, WhiteningError

__all__ = [
    "set_global_seed",
    "choose_sim_seed",
    "extract_seed",
    "kT_kJ_per_mol",
    "beta_per_kJ_mol",
    "PmarloError",
    "TemperatureConsistencyError",
    "WhiteningError",
]
