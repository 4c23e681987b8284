"""Protein-DNA complex MD (round-4 DNA force field).

The reference builds protein-DNA systems through OpenMM's
``amber14-all.xml`` (/root/reference/src/pmarlo/simulation/__init__.py:24
— amber14 bundles DNA.OL15); here the first-party templates
(md/nucleic.py) and parm94-lineage parameters (md/ff_params.py) carry
standard DA/DC/DG/DT residues through the SAME pipeline as protein-only
input: hydrogen addition -> template-matched topology (O3'->P chain
linking, positional 5'-OH/3'-OH termini) -> GBn2 implicit-solvent
system -> minimize -> Langevin MD.

Charge discipline: every internal nucleotide sums to exactly -1 e; the
Amber 5'/3' terminal split (-0.3079/-0.6921) restores integer strand
charges, so the complex's total charge is protein_charge - (N_nt - 1).

Run:  python examples/23_protein_dna_complex.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.data.dna import dna_single_strand
from pmarlo_tpu.io.pdb import PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.integrate import run_md, thermalize
from pmarlo_tpu.md.minimize import minimize_energy
from pmarlo_tpu.protein.hydrogens import add_hydrogens


def main():
    # a peptide plus a GATC single strand, offset so they don't clash
    prot = alanine_dipeptide_structure()
    dna = dna_single_strand("GATC", chain="X")
    for r in dna.residues:
        for i, a in enumerate(r.atoms):
            r.atoms[i] = type(a)(
                name=a.name, resname=a.resname, resid=a.resid,
                chain=a.chain, xyz=(a.xyz[0] + 2.5, a.xyz[1], a.xyz[2]),
                element=a.element,
            )
    combo = PDBStructure(residues=list(prot.residues) + list(dna.residues))

    # the same prep path a real PDB/mmCIF protein-DNA complex takes
    combo_h = add_hydrogens(combo, ph=7.0)
    system, x0 = build_system(combo_h, gb_model="gbn2")
    total_q = float(np.sum(np.asarray(system.charges)))
    print(f"system: {system.n_atoms} atoms, total charge {total_q:+.4f} e "
          "(alanine dipeptide 0, 4-mer strand -3)")

    xmin, e_min = minimize_energy(system, jnp.asarray(x0),
                                  max_iterations=2000)
    print(f"minimized energy: {float(e_min):.1f} kJ/mol")

    state = thermalize(system, xmin, jax.random.PRNGKey(0), 300.0)
    final, frames = run_md(system, state, n_steps=10_000, dt=0.001,
                           friction=1.0, temperature_K=300.0,
                           report_interval=1000)
    T = np.asarray(frames["temperature"])
    print("temperature trace (K):", np.round(T, 1))
    assert np.isfinite(np.asarray(final.positions)).all()
    print("protein-DNA segment complete.")


if __name__ == "__main__":
    main()
