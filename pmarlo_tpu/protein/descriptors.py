"""Molecular descriptors from the topology graph (the RDKit subset).

The reference computes MolWt / HBD / HBA / TPSA / LogP via RDKit
(src/pmarlo/protein/protein.py:605-617). Here the structural descriptors
are first-party, derived from the matched topology:

- h_bond_donors:    N-H / O-H / S-H bond count (RDKit Lipinski.NumHDonors
  counts donor ATOMS; both are reported).
- h_bond_acceptors: N + O atom count (RDKit Lipinski.NumHAcceptors
  convention).
- tpsa:             Ertl 2000 additive polar surface area over the N/O
  fragment classes that occur in proteins (amide NH, NH2, NH3+, aromatic
  n/nH, ether/hydroxyl O, carbonyl O). Sulfur contributes 0, matching
  RDKit's default TPSA. Charged guanidinium/ammonium nitrogens use the
  Ertl [NH+]/[NH2+]/[NH3+] values — a documented approximation for the
  resonance-delocalized cases.
- gravy:            Kyte-Doolittle grand average of hydropathy — the
  protein-appropriate hydrophobicity scalar reported INSTEAD of Crippen
  MolLogP (whose 68-class atomic parameter table is not reproducible
  here without the published supplement; documented gap).
"""

from __future__ import annotations

from typing import Dict, List, Set

#: Ertl et al. 2000 TPSA contributions (A^2) for protein N/O environments
_TPSA = {
    "N_3heavy": 3.24,      # tertiary amine / PRO backbone N
    "NH_2heavy": 12.03,    # secondary amine / backbone amide N-H
    "NH2_1heavy": 26.02,   # primary amide NH2 (ASN/GLN), neutral
    "NH3_plus": 27.64,     # protonated primary amine (LYS NZ, N-term)
    "NH2_plus": 16.61,     # =NH2+ guanidinium terminal N
    "NH_plus_2heavy": 13.97,  # protonated secondary (HIP ring N-H approx)
    "n_arom": 12.89,       # aromatic N, no H (HIS ND1/NE2 unprotonated)
    "nH_arom": 15.79,      # aromatic N-H (TRP NE1, HIS N-H)
    "O_2heavy": 9.23,      # ether O (none in standard residues)
    "OH": 20.23,           # hydroxyl (SER/THR/TYR, protonated acids)
    "O_double": 17.07,     # carbonyl / each carboxylate O
}

#: Kyte-Doolittle hydropathy
_KD = {
    "ALA": 1.8, "ARG": -4.5, "ASN": -3.5, "ASP": -3.5, "CYS": 2.5,
    "GLN": -3.5, "GLU": -3.5, "GLY": -0.4, "HIS": -3.2, "ILE": 4.5,
    "LEU": 3.8, "LYS": -3.9, "MET": 1.9, "PHE": 2.8, "PRO": -1.6,
    "SER": -0.8, "THR": -0.7, "TRP": -0.9, "TYR": -1.3, "VAL": 4.2,
    # protonation variants map to their parents
    "ASH": -3.5, "GLH": -3.5, "LYN": -3.9,
    "HID": -3.2, "HIE": -3.2, "HIP": -3.2,
}

#: aromatic ring nitrogens by (residue family, atom name)
_AROMATIC_N = {
    ("TRP", "NE1"), ("HIS", "ND1"), ("HIS", "NE2"),
    ("HIE", "ND1"), ("HIE", "NE2"), ("HID", "ND1"), ("HID", "NE2"),
    ("HIP", "ND1"), ("HIP", "NE2"),
}

#: positively charged nitrogens (by residue/atom)
_CHARGED_N = {
    ("LYS", "NZ"), ("ARG", "NH1"), ("ARG", "NH2"), ("ARG", "NE"),
    ("HIP", "ND1"), ("HIP", "NE2"),
}


def compute_descriptors(topology) -> Dict[str, float]:
    """Structural descriptor dict from an md.topology.Topology."""
    neighbors = topology.neighbor_sets()
    elements = topology.elements
    names = topology.atom_names
    resnames = topology.residue_names

    hbd_bonds = 0
    hbd_atoms = 0
    hba = 0
    tpsa = 0.0
    for i, elem in enumerate(elements):
        nbrs = sorted(neighbors[i])
        n_h = sum(1 for j in nbrs if elements[j] == "H")
        n_heavy = len(nbrs) - n_h
        if elem in ("N", "O", "S") and n_h > 0:
            hbd_bonds += n_h
            hbd_atoms += 1
        if elem in ("N", "O"):
            hba += 1
        # --- Ertl TPSA classification -----------------------------------
        key = (resnames[i], names[i])
        base = (resnames[i][:3] if resnames[i][0] in "NC" and
                len(resnames[i]) == 4 else resnames[i])
        key_base = (base, names[i])
        if elem == "N":
            is_arom = key_base in _AROMATIC_N or key in _AROMATIC_N
            charged = (key_base in _CHARGED_N or key in _CHARGED_N
                       or n_h == 3)
            if is_arom:
                tpsa += _TPSA["nH_arom"] if n_h else _TPSA["n_arom"]
            elif n_h == 3:
                tpsa += _TPSA["NH3_plus"]
            elif n_h == 2:
                tpsa += (_TPSA["NH2_plus"] if charged
                         else _TPSA["NH2_1heavy"])
            elif n_h == 1:
                tpsa += (_TPSA["NH_plus_2heavy"] if charged
                         else _TPSA["NH_2heavy"])
            else:
                tpsa += _TPSA["N_3heavy"]
        elif elem == "O":
            if n_h >= 1:
                tpsa += _TPSA["OH"]
            elif n_heavy == 1:
                tpsa += _TPSA["O_double"]   # carbonyl / carboxylate O
            else:
                tpsa += _TPSA["O_2heavy"]

    # GRAVY over residues that have a hydropathy value
    seq: List[str] = []
    seen: Set[int] = set()
    for rid, rn in zip(topology.residue_ids, topology.residue_names):
        if rid in seen:
            continue
        seen.add(rid)
        base = rn[1:] if len(rn) == 4 and rn[0] in "NC" else rn
        if base in _KD:
            seq.append(base)
    gravy = (sum(_KD[r] for r in seq) / len(seq)) if seq else float("nan")

    return {
        "h_bond_donors": hbd_bonds,
        "h_bond_donor_atoms": hbd_atoms,
        "h_bond_acceptors": hba,
        "tpsa": round(tpsa, 2),
        "gravy": round(gravy, 3),
    }


__all__ = ["compute_descriptors"]
