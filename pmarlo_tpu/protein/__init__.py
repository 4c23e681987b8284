from .protein import Protein
from .repair import find_missing_heavy_atoms, repair_missing_atoms
from .solvate import solvate_structure, structure_formal_charge
from .nonstandard import replace_nonstandard

__all__ = [
    "Protein",
    "find_missing_heavy_atoms",
    "repair_missing_atoms",
    "solvate_structure",
    "structure_formal_charge",
    "replace_nonstandard",
]
