"""The ``System`` pytree: every force-field parameter as a static-shaped array.

This is the TPU-native equivalent of an OpenMM ``System``
(reference: src/pmarlo/simulation/__init__.py:64-71 builds one via
ForceField("amber14-all.xml", "implicit/gbn2.xml")). Unlike OpenMM's opaque
C++ object, a ``System`` here is a plain pytree of jnp arrays: it can be
donated to jit, vmapped over, stored in checkpoints, and sharded.

Shapes are static: the topology fixes n_atoms/n_bonds/..., so every MD step
compiles once. Pairwise nonbonded interactions use dense (N, N) scale
matrices — for implicit-solvent protein systems (N <= a few thousand) this
is both simpler and faster on TPU than neighbor lists, and it matches the
reference's NoCutoff setting.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class System:
    """Force-field parameters + topology metadata for one molecular system.

    All index arrays are int32; parameter arrays float32. Units: kJ/mol, nm,
    ps, amu, elementary charge, radians.
    """

    # --- per-atom ---
    masses: jax.Array            # (N,) amu (after HMR if enabled)
    charges: jax.Array           # (N,) e
    # --- bonded terms ---
    bond_idx: jax.Array          # (NB, 2)
    bond_k: jax.Array            # (NB,) kJ/mol/nm^2  (E = 0.5 k (r-r0)^2)
    bond_r0: jax.Array           # (NB,) nm
    angle_idx: jax.Array         # (NA, 3)
    angle_k: jax.Array           # (NA,) kJ/mol/rad^2 (E = 0.5 k (t-t0)^2)
    angle_t0: jax.Array          # (NA,) rad
    torsion_idx: jax.Array       # (NT, 4)  (propers + impropers)
    torsion_k: jax.Array         # (NT,) kJ/mol      (E = k (1 + cos(n phi - phase)))
    torsion_n: jax.Array         # (NT,) periodicity (float for jit math)
    torsion_phase: jax.Array     # (NT,) rad
    # --- nonbonded (dense pairwise) ---
    lj_sigma: jax.Array          # (N,) nm
    lj_eps: jax.Array            # (N,) kJ/mol
    # --- GB implicit solvent (OBC/GBn2 family) ---
    gb_radii: jax.Array          # (N,) nm intrinsic Born radii (offset NOT applied)
    gb_screen: jax.Array         # (N,) HCT/GBn2 screening factors
    #: dense (N, N) pair-scale matrices (0 excluded, 1/1.2 or 1/2 for
    #: 1-4, 1 otherwise). None for large systems — the O(N) cell path
    #: (md/cells.py) works from the sparse excl12_idx/pair14_idx lists
    #: instead, and dense paths raise a clear error.
    scale_elec: Optional[jax.Array] = None
    scale_lj: Optional[jax.Array] = None
    #: per-atom tanh-rescale coefficients. None -> global OBC2 constants.
    #: GBn2 (reference implicit/gbn2.xml) uses per-element values
    #: (md/gbn2.py GBN2_ALPHA_BETA_GAMMA).
    gb_alpha: Optional[jax.Array] = None   # (N,)
    gb_beta: Optional[jax.Array] = None    # (N,)
    gb_gamma: Optional[jax.Array] = None   # (N,)
    #: GBn2 neck-correction lookup per pair (None -> no neck term)
    gb_neck_d0: Optional[jax.Array] = None  # (N, N) nm
    gb_neck_m0: Optional[jax.Array] = None  # (N, N) 1/nm
    #: exclusion index lists for the neighbor-list path (md/nblist.py):
    #: 1-2/1-3 pairs (full exclusion) and 1-4 pairs (scee/scnb scaling)
    excl12_idx: Optional[jax.Array] = None  # (P1, 2) int32
    pair14_idx: Optional[jax.Array] = None  # (P2, 2) int32
    #: virtual interaction sites (md/vsites.py): massless particles whose
    #: positions are parent-defined combinations (TIP4P-Ew M sites,
    #: TIP5P lone pairs). (V, 4) int32 [site, p0, p1, p2] + (V, 3)
    #: weights + optional (V,) kind (0 = three-particle average,
    #: 1 = out-of-plane; None = all-average, the historical layout).
    vsite_idx: Optional[jax.Array] = None
    vsite_weights: Optional[jax.Array] = None
    vsite_kind: Optional[jax.Array] = None
    # --- static metadata (aux_data, not traced) ---
    atom_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True), default=())
    atom_types: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True), default=())
    residue_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True), default=())
    residue_ids: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True), default=())
    solvent_dielectric: float = dataclasses.field(metadata=dict(static=True), default=78.5)
    solute_dielectric: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    use_gb: bool = dataclasses.field(metadata=dict(static=True), default=True)
    #: "obc2" or "gbn2" (reference runs gbn2: simulation/__init__.py:64-71)
    gb_model: str = dataclasses.field(metadata=dict(static=True), default="obc2")
    #: dielectric offset (nm): 0.009 for OBC2, 0.0195141 for GBn2
    gb_offset: float = dataclasses.field(metadata=dict(static=True), default=0.009)
    #: neck-integral scale (GBn2: 0.826836; 0 disables)
    gb_neck_scale: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    surface_tension: float = dataclasses.field(
        metadata=dict(static=True), default=28.3919551
    )  # kJ/mol/nm^2 (ACE SA prefactor, OpenMM GBSAOBCForce default)
    #: orthorhombic periodic box lengths (nm). None -> non-periodic
    #: (implicit solvent, NoCutoff — the reference's setting). Set by
    #: build_system(box=...) for the explicit-solvent path.
    box: Optional[Tuple[float, float, float]] = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    #: triclinic off-diagonals (bx, cx, cy) in nm (GROMACS reduced
    #: form, md/box.py); None -> orthorhombic. ``box`` keeps carrying
    #: the lattice diagonal (ax, by, cz) either way.
    tilt: Optional[Tuple[float, float, float]] = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    #: nonbonded cutoff (nm) for the periodic path (min-image LJ +
    #: reaction-field electrostatics, OpenMM CutoffPeriodic semantics)
    cutoff: float = dataclasses.field(metadata=dict(static=True), default=0.9)
    #: LJ switching distance (nm): OpenMM ``setUseSwitchingFunction``
    #: parity. None (default, matching createSystem) -> potential-shifted
    #: truncation at ``cutoff``; a value in (0, cutoff) multiplies the
    #: UNSHIFTED LJ energy by the quintic smoothstep S(r) on
    #: [switch_distance, cutoff] so both energy and force go smoothly to
    #: zero at the cutoff (md/forces.py lj_switch). Electrostatics (RF /
    #: Ewald) are unaffected, as in OpenMM.
    switch_distance: Optional[float] = dataclasses.field(
        metadata=dict(static=True), default=None
    )

    @property
    def n_atoms(self) -> int:
        return int(self.masses.shape[0])

    def atom_index(self, residue_id: int, atom_name: str) -> int:
        """Host-side lookup of an atom index by (residue id, atom name)."""
        for i, (rid, name) in enumerate(zip(self.residue_ids, self.atom_names)):
            if rid == residue_id and name == atom_name:
                return i
        raise KeyError(f"no atom {atom_name!r} in residue {residue_id}")

    def select(self, name: str) -> np.ndarray:
        """Indices of all atoms with the given atom name (e.g. 'CA')."""
        return np.asarray(
            [i for i, n in enumerate(self.atom_names) if n == name], dtype=np.int64
        )

    def to_dict(self) -> Dict[str, Any]:
        d = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            d[f.name] = np.asarray(v) if isinstance(v, (jax.Array, np.ndarray)) else v
        return d


def require_dense_scales(system, context: str) -> None:
    """Fail fast when a dense force path is used on a system built
    without (N, N) scale matrices (build_system(dense_scales=False),
    automatic past 12k atoms). Without this check np.asarray(None)
    silently becomes a 0-d NaN and poisons every force."""
    if system.scale_elec is None or system.scale_lj is None:
        raise ValueError(
            f"{context} needs the dense (N, N) scale matrices, but this "
            f"System ({system.n_atoms} atoms) was built without them "
            "(dense_scales=False, automatic past 12k atoms). Use the "
            "O(N) cell path (md.pallas_cells.build_cell_force_fn / "
            "run_segment(nonbonded='cells'|'pme')) or rebuild with "
            "build_system(dense_scales=True)."
        )


def hydrogen_mass_repartition(
    masses: np.ndarray,
    bond_idx: np.ndarray,
    hydrogen_mass: float = 3.0,
    is_hydrogen: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Repartition mass from heavy atoms into bonded hydrogens.

    Mirrors OpenMM's hydrogenMass option (reference
    simulation/__init__.py:70 uses 1.5 amu; we default to 3 amu because the
    JAX integrator runs unconstrained and benefits from slower H modes).
    Total mass is conserved.
    """
    masses = np.asarray(masses, dtype=np.float64).copy()
    started_massless = masses == 0.0   # virtual sites stay massless
    if is_hydrogen is None:
        is_hydrogen = (masses > 0.0) & (masses < 2.0)
    for a, b in np.asarray(bond_idx):
        h, heavy = (a, b) if is_hydrogen[a] else (b, a)
        if not is_hydrogen[h] or is_hydrogen[heavy]:
            continue
        delta = hydrogen_mass - masses[h]
        masses[h] += delta
        masses[heavy] -= delta
    if np.any(masses[~started_massless] <= 0):
        raise ValueError("HMR drove a heavy-atom mass non-positive")
    return masses


__all__ = ["System", "hydrogen_mass_repartition"]
