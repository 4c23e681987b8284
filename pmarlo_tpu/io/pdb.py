"""Minimal, dependency-free PDB reading/writing.

Replaces the reference's mdtraj/PDBFixer structure loading for the prep
path (reference: src/pmarlo/protein/protein.py:288 loads PDBs via OpenMM
app / PDBFixer). Coordinates are returned in nanometers.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class PDBAtom:
    name: str
    resname: str
    resid: int
    chain: str
    xyz: Tuple[float, float, float]  # nm
    element: str


@dataclasses.dataclass
class PDBResidue:
    name: str
    resid: int
    chain: str
    atoms: List[PDBAtom]


@dataclasses.dataclass
class PDBStructure:
    residues: List[PDBResidue]
    n_models: int = 1
    #: orthorhombic box lengths (nm) from CRYST1, when present
    box: "Tuple[float, float, float] | None" = None

    @property
    def n_atoms(self) -> int:
        return sum(len(r.atoms) for r in self.residues)

    def coordinates(self) -> np.ndarray:
        return np.asarray(
            [a.xyz for r in self.residues for a in r.atoms], dtype=np.float64
        )

    def sequence(self) -> List[str]:
        return [r.name for r in self.residues]


_ELEMENT_FALLBACK = {"C": "C", "N": "N", "O": "O", "S": "S", "H": "H", "P": "P"}


def _guess_element(atom_name: str, element_field: str) -> str:
    element_field = element_field.strip()
    if element_field:
        return element_field.capitalize()
    name = atom_name.strip()
    # strip leading digits ("1HH3")
    stripped = name.lstrip("0123456789")
    if not stripped:
        return "X"
    first = stripped[0].upper()
    return _ELEMENT_FALLBACK.get(first, first)


def read_pdb(path: "str | Path", model: int = 1) -> PDBStructure:
    """Parse ATOM/HETATM records of the given MODEL (1-based).

    Column-based parsing per the PDB v3 fixed-width spec. Waters and
    non-protein heterogens are kept (callers filter); altlocs other than
    ''/'A' are dropped.
    """
    path = Path(path)
    residues: List[PDBResidue] = []
    index: Dict[Tuple[str, int, str], PDBResidue] = {}
    n_models = 0
    current_model = 1
    in_wanted_model = True
    box = None

    for line in path.read_text().splitlines():
        record = line[:6]
        if record.startswith("CRYST1"):
            try:
                a = float(line[6:15]) / 10.0
                b = float(line[15:24]) / 10.0
                c = float(line[24:33]) / 10.0
                if a > 0 and b > 0 and c > 0:
                    box = (a, b, c)
            except ValueError:
                pass
            continue
        if record.startswith("MODEL"):
            n_models += 1
            current_model = int(line.split()[1]) if len(line.split()) > 1 else n_models
            in_wanted_model = current_model == model
            continue
        if record.startswith("ENDMDL"):
            in_wanted_model = False if n_models >= model else in_wanted_model
            continue
        if not in_wanted_model:
            continue
        if record not in ("ATOM  ", "HETATM"):
            continue
        altloc = line[16]
        if altloc not in (" ", "A"):
            continue
        name = line[12:16].strip()
        resname = line[17:20].strip() or line[17:21].strip()
        chain = line[21].strip() or "A"
        try:
            resid = int(line[22:26])
        except ValueError:
            continue
        x = float(line[30:38]) / 10.0
        y = float(line[38:46]) / 10.0
        z = float(line[46:54]) / 10.0
        element = _guess_element(name, line[76:78] if len(line) >= 78 else "")
        key = (chain, resid, resname)
        if key not in index:
            res = PDBResidue(name=resname, resid=resid, chain=chain, atoms=[])
            index[key] = res
            residues.append(res)
        index[key].atoms.append(
            PDBAtom(name=name, resname=resname, resid=resid, chain=chain,
                    xyz=(x, y, z), element=element)
        )
    if not residues:
        raise ValueError(f"no ATOM records found in {path} (model {model})")
    return PDBStructure(residues=residues, n_models=max(n_models, 1),
                        box=box)


def write_pdb(
    path: "str | Path",
    coordinates: np.ndarray,
    atom_names: Sequence[str],
    residue_names: Sequence[str],
    residue_ids: Sequence[int],
    elements: Optional[Sequence[str]] = None,
    chain: str = "A",
    chains: Optional[Sequence[str]] = None,
    box: Optional[Sequence[float]] = None,
) -> Path:
    """Write one model. ``coordinates`` (N, 3) in nm.

    ``chains`` (per-atom) overrides the single ``chain``; ``box`` (nm, 3
    lengths) emits an orthorhombic CRYST1 record (solvated exports).
    Serials and resids wrap at their PDB field widths (100000 / 10000),
    the standard convention for large solvated systems."""
    path = Path(path)
    coords = np.asarray(coordinates, dtype=np.float64) * 10.0  # nm -> A
    if coords.ndim != 2 or coords.shape[1] != 3:
        raise ValueError(f"coordinates must be (N, 3), got {coords.shape}")
    n = coords.shape[0]
    if not (len(atom_names) == len(residue_names) == len(residue_ids) == n):
        raise ValueError("metadata length mismatch with coordinates")
    if elements is None:
        elements = [_guess_element(a, "") for a in atom_names]
    lines = []
    if box is not None:
        a, b, c = (float(x) * 10.0 for x in box)  # nm -> A
        lines.append(
            f"CRYST1{a:9.3f}{b:9.3f}{c:9.3f}"
            f"{90.0:7.2f}{90.0:7.2f}{90.0:7.2f} P 1           1"
        )
    for i in range(n):
        name = atom_names[i]
        pdb_name = f" {name:<3s}" if len(name) < 4 else f"{name:<4s}"
        ch = (chains[i] if chains is not None else chain)[:1]
        lines.append(
            f"ATOM  {(i + 1) % 100000:>5d} {pdb_name}"
            f"{'':1s}{residue_names[i]:>3s} {ch}"
            f"{residue_ids[i] % 10000:>4d}    "
            f"{coords[i, 0]:8.3f}{coords[i, 1]:8.3f}{coords[i, 2]:8.3f}"
            f"{1.00:6.2f}{0.00:6.2f}          {elements[i]:>2s}"
        )
    lines.append("TER")
    lines.append("END")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")
    return path


def write_pdb_trajectory(
    path: "str | Path",
    frames: np.ndarray,
    atom_names: Sequence[str],
    residue_names: Sequence[str],
    residue_ids: Sequence[int],
    chain: str = "A",
) -> Path:
    """Write a multi-MODEL PDB trajectory. ``frames`` (T, N, 3) in nm."""
    path = Path(path)
    frames = np.asarray(frames, dtype=np.float64)
    chunks = []
    for m, frame in enumerate(frames, start=1):
        chunks.append(f"MODEL     {m:>4d}")
        coords = frame * 10.0
        for i in range(coords.shape[0]):
            name = atom_names[i]
            pdb_name = f" {name:<3s}" if len(name) < 4 else f"{name:<4s}"
            chunks.append(
                f"ATOM  {i + 1:>5d} {pdb_name}"
                f"{'':1s}{residue_names[i]:>3s} {chain}{residue_ids[i]:>4d}    "
                f"{coords[i, 0]:8.3f}{coords[i, 1]:8.3f}{coords[i, 2]:8.3f}"
                f"{1.00:6.2f}{0.00:6.2f}"
            )
        chunks.append("ENDMDL")
    chunks.append("END")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(chunks) + "\n")
    return path


__all__ = ["PDBStructure", "PDBAtom", "PDBResidue", "read_pdb", "write_pdb",
           "write_pdb_trajectory"]
