"""RNA strand MD with Mg2+ counter-ions (round-4 RNA force field).

The reference builds nucleic systems through OpenMM's
``amber14-all.xml`` (/root/reference/src/pmarlo/simulation/__init__.py:24
— amber14 bundles RNA.OL3); here the first-party ribonucleotide
templates (md/nucleic.py A/C/G/U, ff94 charges, 2'-hydroxyl backbone)
and parm94/99-lineage parameters carry an RNA strand through the same
pipeline as protein input: hydrogen addition -> template-matched
topology (O3'->P chain linking, positional 5'-OH/3'-OH termini) ->
GBn2 implicit-solvent system -> minimize -> Langevin MD.

The second half shows the EXPLICIT path retaining Mg2+ ions next to an
RNA strand (the reference's PDBFixer prep strips crystal ions;
retention is a deliberate capability extension — RNA structure is
Mg2+-dependent in practice).

Run:  python examples/25_rna_md.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from pmarlo_tpu.data.dna import rna_single_strand
from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.integrate import run_md, thermalize
from pmarlo_tpu.md.minimize import minimize_energy
from pmarlo_tpu.protein.hydrogens import add_hydrogens


def main():
    # --- implicit-solvent RNA (GBn2), the standard pipeline ------------
    strand = rna_single_strand("GGACUUCC")
    with_h = add_hydrogens(strand, ph=7.0)
    system, x0 = build_system(with_h, gb_model="gbn2")
    total_q = float(np.sum(np.asarray(system.charges)))
    print(f"8-mer RNA: {system.n_atoms} atoms, total charge {total_q:+.3f} e"
          f" (expected {-(8 - 1)} — one phosphate per internal linkage)")

    xmin, _ = minimize_energy(system, jnp.asarray(x0), max_iterations=2000)
    state = thermalize(system, xmin, jax.random.PRNGKey(0), 300.0)
    final, frames = run_md(system, state, n_steps=8000, dt=0.001,
                           friction=2.0, temperature_K=300.0,
                           report_interval=500)
    T = np.asarray(frames["temperature"])
    print(f"implicit MD: 8 ps stable, T_final={float(T[-1]):.0f} K, "
          f"finite={bool(np.isfinite(np.asarray(final.positions)).all())}")

    # --- explicit path: strand + Mg2+ ions in a periodic box ------------
    def ion(resname, resid, xyz):
        return PDBResidue(name=resname, resid=resid, chain="I", atoms=[
            PDBAtom(name=resname, resname=resname, resid=resid, chain="I",
                    xyz=tuple(xyz),
                    element=resname[0] + resname[1:].lower())])

    small = add_hydrogens(rna_single_strand("GC"), ph=7.0)
    coords = small.coordinates()
    center = coords.mean(axis=0)
    shift = np.array([1.5, 1.5, 1.5]) - center
    for r in small.residues:
        for i, a in enumerate(r.atoms):
            r.atoms[i] = PDBAtom(name=a.name, resname=a.resname,
                                 resid=a.resid, chain=a.chain,
                                 xyz=tuple(np.asarray(a.xyz) + shift),
                                 element=a.element)
    residues = list(small.residues)
    # GC 2-mer carries -1; one Mg2+ and one Cl- neutralize
    residues.append(ion("MG", 90, (0.6, 0.6, 0.6)))
    residues.append(ion("CL", 91, (2.4, 2.4, 2.4)))
    boxed = PDBStructure(residues=residues)
    system2, y0 = build_system(boxed, box=(3.0, 3.0, 3.0), cutoff=0.9)
    q2 = float(np.sum(np.asarray(system2.charges)))
    print(f"explicit GC + Mg2+ + Cl-: {system2.n_atoms} atoms, "
          f"net charge {q2:+.3f} e (ions retained, not stripped)")
    ymin, _ = minimize_energy(system2, jnp.asarray(y0), max_iterations=500)
    st2 = thermalize(system2, ymin, jax.random.PRNGKey(1), 300.0)
    # strong friction: the Mg2+ starts displaced from its equilibrium
    # shell and the 66-atom box needs the thermostat to drain the
    # electrostatic infall energy quickly
    final2, frames2 = run_md(system2, st2, n_steps=5000, dt=0.001,
                             friction=5.0, temperature_K=300.0,
                             report_interval=500)
    T2 = np.asarray(frames2["temperature"])
    print(f"explicit MD: 5 ps stable, T_final={float(T2[-1]):.0f} K")


if __name__ == "__main__":
    main()
