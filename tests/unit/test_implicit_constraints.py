"""X-H SHAKE constraints on the implicit-solvent path: the 4 fs GB
production protocol (constraints="hbonds" + HMR 3 amu + dt 4 fs).

Reference analogue: OpenMM ``createSystem(constraints=HBonds)``
(/root/reference/src/pmarlo/simulation/__init__.py:64-71 builds with
HBonds + hydrogenMass); the reference runs 2 fs — the 4 fs protocol
here is the standard Amber SHAKE+HMR extension of it.
"""

import numpy as np
import pytest


def _ala_pdb(tmp_path):
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.io.pdb import write_pdb

    s = alanine_dipeptide_structure()
    pdb = tmp_path / "ala.pdb"
    write_pdb(
        pdb, s.coordinates(),
        [a.name for r in s.residues for a in r.atoms],
        [a.resname for r in s.residues for a in r.atoms],
        [a.resid for r in s.residues for a in r.atoms],
    )
    return pdb


def test_hbonds_4fs_segment_stable_and_constrained(tmp_path):
    """dt = 4 fs with SHAKE X-H: temperature in band, every constrained
    bond at its rest length in the final frame (SHAKE actually ran)."""
    from pmarlo_tpu.md.ff_params import TYPE_ELEMENTS
    from pmarlo_tpu.md.simulation import run_segment

    res = run_segment(
        _ala_pdb(tmp_path), n_steps=800, report_interval=100,
        dt_ps=0.004, temperature_K=300.0, constraints="hbonds",
        minimize_iterations=300, seed=1,
    )
    temps = np.asarray(res["temperature"])
    assert np.isfinite(temps).all()
    assert 150.0 < float(temps[-4:].mean()) < 450.0

    system = res["system"]
    x = np.asarray(res["final_state"].positions)
    is_h = np.asarray([TYPE_ELEMENTS.get(t, "X") == "H"
                       for t in system.atom_types])
    bond_idx = np.asarray(system.bond_idx)
    r0 = np.asarray(system.bond_r0)
    con = is_h[bond_idx[:, 0]] | is_h[bond_idx[:, 1]]
    assert con.any()
    d = np.linalg.norm(x[bond_idx[con, 0]] - x[bond_idx[con, 1]], axis=1)
    # SHAKE tolerance is relative ~1e-6; 1e-4 nm catches "not applied"
    assert np.abs(d - r0[con]).max() < 1e-4


def test_hbonds_stripped_energy_matches_full_at_constrained_geometry(
    tmp_path,
):
    """MD forces come from the STRIPPED system (constrained bond terms
    removed, createSystem semantics). At SHAKE-satisfied geometry those
    terms are ~0, so the reported PE must match the FULL system's."""
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import make_force_fn
    from pmarlo_tpu.md.simulation import run_segment

    pdb = _ala_pdb(tmp_path)
    res = run_segment(
        pdb, n_steps=200, report_interval=100, dt_ps=0.004,
        temperature_K=300.0, constraints="hbonds",
        minimize_iterations=300, seed=2,
    )
    import jax.numpy as jnp

    full_system, _ = build_system(pdb, gb_model="gbn2")
    fn_full = make_force_fn(full_system, None, analytic=True)
    e_full, _ = fn_full(jnp.asarray(res["final_state"].positions))
    e_reported = float(np.asarray(res["potential_energy"])[-1])
    # constrained bonds at r0 contribute k/2 * (1e-6)^2 ~ 0
    assert abs(float(e_full) - e_reported) < 0.05


def test_hbonds_nve_conserves_at_4fs(tmp_path):
    """NVE + SHAKE/RATTLE at 4 fs: the constrained integrator must
    still conserve (RATTLE projection is part of the symplectic map)."""
    from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
    from pmarlo_tpu.md.simulation import run_segment

    res = run_segment(
        _ala_pdb(tmp_path), n_steps=600, report_interval=100,
        dt_ps=0.004, temperature_K=300.0, ensemble="nve",
        constraints="hbonds", minimize_iterations=300, seed=3,
    )
    e = np.asarray(res["total_energy"])
    assert np.isfinite(e).all()
    n_dof = 3 * res["system"].n_atoms - 3 - 12  # alanine: 12 X-H bonds
    kt = BOLTZMANN_CONSTANT_KJ_PER_MOL * 300.0
    drift = abs(float(e[-1] - e[0])) / (n_dof * kt)
    # 2.4 ps at 4 fs: generous band, catches blow-up / missing RATTLE
    assert drift < 0.2, f"constrained NVE drift {drift:.4f} kT/dof"


def test_constraints_validation(tmp_path):
    from pmarlo_tpu.md.simulation import run_segment

    with pytest.raises(ValueError, match="constraints"):
        run_segment(_ala_pdb(tmp_path), n_steps=100, report_interval=100,
                    constraints="rigid")


def test_remd_facade_hbonds_4fs(tmp_path):
    """run_replica_exchange(constraints='hbonds') at 4 fs: replicas
    exchange and the trajectory stays finite."""
    from pmarlo_tpu.remd.remd import RemdConfig, run_replica_exchange

    cfg = RemdConfig(n_replicas=3, t_min=300.0, t_max=360.0,
                     exchange_frequency=50, report_interval=50,
                     dt_ps=0.004, seed=0)
    result, system = run_replica_exchange(
        _ala_pdb(tmp_path), n_steps=200, config=cfg,
        constraints="hbonds",
    )
    acc = result.acceptance_matrix
    assert np.isfinite(acc[np.isfinite(acc)]).all()
    for rung in range(3):
        traj = np.asarray(result.demuxed_trajectory(rung))
        assert np.isfinite(traj).all()
