"""Golden-value physics tests: every force-field term against values that
can be derived by hand (or from textbook limits), so a transcription error
in md/ff_params.py fails CI — the reference validated through an external
OpenMM oracle (tests/force/test_fd_vs_torchforce.py:25-84); this suite is
the oracle this environment can support, plus a float64 finite-difference
force check on the full alanine system.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 as KE
from pmarlo_tpu.md import ff_params as ff
from pmarlo_tpu.md.forces import (
    bond_energy,
    angle_energy,
    gb_energy,
    nonbonded_energy,
    potential_energy,
    torsion_energy,
)
from pmarlo_tpu.md.system import System


def _tiny_system(
    *,
    charges,
    lj_sigma=None,
    lj_eps=None,
    gb_radii=None,
    bonds=None,
    bond_k=None,
    bond_r0=None,
    use_gb=False,
):
    n = len(charges)
    z = lambda shape: jnp.zeros(shape, jnp.float32)
    iz = lambda shape: jnp.zeros(shape, jnp.int32)
    nb = 0 if bonds is None else len(bonds)
    full = 1.0 - jnp.eye(n, dtype=jnp.float32) if n > 1 else jnp.ones((n, n))
    if bonds is not None:
        full = np.array(full)  # writable copy
        for a, b in bonds:
            full[a, b] = full[b, a] = 0.0
        full = jnp.asarray(full)
    return System(
        masses=jnp.ones(n, jnp.float32) * 12.0,
        charges=jnp.asarray(charges, jnp.float32),
        bond_idx=(iz((0, 2)) if bonds is None else jnp.asarray(bonds, jnp.int32)),
        bond_k=(z((0,)) if bonds is None else jnp.asarray(bond_k, jnp.float32)),
        bond_r0=(z((0,)) if bonds is None else jnp.asarray(bond_r0, jnp.float32)),
        angle_idx=iz((0, 3)), angle_k=z((0,)), angle_t0=z((0,)),
        torsion_idx=iz((0, 4)), torsion_k=z((0,)), torsion_n=z((0,)),
        torsion_phase=z((0,)),
        lj_sigma=(z((n,)) if lj_sigma is None else jnp.asarray(lj_sigma, jnp.float32)),
        lj_eps=(z((n,)) if lj_eps is None else jnp.asarray(lj_eps, jnp.float32)),
        scale_elec=full, scale_lj=full,
        gb_radii=(jnp.full((n,), 0.15) if gb_radii is None
                  else jnp.asarray(gb_radii, jnp.float32)),
        gb_screen=jnp.full((n,), 0.8),
        use_gb=use_gb,
    )


def test_coulomb_two_charges():
    """E = ke q1 q2 / r with ke = 138.935456 kJ nm / mol e^2."""
    s = _tiny_system(charges=[1.0, -1.0])
    x = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    e = float(nonbonded_energy(s, x))
    assert e == pytest.approx(-KE, rel=1e-5)
    x2 = jnp.array([[0.0, 0, 0], [0.5, 0, 0]])
    assert float(nonbonded_energy(s, x2)) == pytest.approx(-2 * KE, rel=1e-5)


def test_lj_minimum_and_zero():
    """LJ = 0 at r = sigma; LJ = -eps at r = 2^(1/6) sigma."""
    s = _tiny_system(charges=[0.0, 0.0], lj_sigma=[0.3, 0.3], lj_eps=[0.5, 0.5])
    at = lambda r: float(nonbonded_energy(
        s, jnp.array([[0.0, 0, 0], [r, 0, 0]])))
    assert at(0.3) == pytest.approx(0.0, abs=1e-4)
    rmin = 0.3 * 2 ** (1 / 6)
    assert at(rmin) == pytest.approx(-0.5, rel=1e-5)
    # force is zero at the minimum
    g = jax.grad(lambda x: nonbonded_energy(s, x))(
        jnp.array([[0.0, 0, 0], [rmin, 0, 0]]))
    assert float(jnp.max(jnp.abs(g))) < 1e-3


def test_bond_harmonic_energy():
    """The amber tables store K (kcal/mol/A^2) with E_amber = K (r-r0)^2;
    in our E = 0.5 k' x^2 convention the built System must carry
    k' = 2 K * 4.184 * 100 (kJ/mol/nm^2). Verified through a real built
    system so the CONVERSION path is under test, not just the table."""
    k_amber, r0_ang = ff.lookup_bond("CT", "HC")
    # parm94: CT-HC K=340 kcal/mol/A^2, r0=1.090 A
    assert k_amber == pytest.approx(340.0)
    assert r0_ang == pytest.approx(1.090)
    k2 = 2 * 340.0 * 4.184 * 100.0
    r0 = 0.1090
    s = _tiny_system(charges=[0.0, 0.0], bonds=[[0, 1]],
                     bond_k=[k2], bond_r0=[r0])
    x = jnp.array([[0.0, 0, 0], [r0 + 0.01, 0, 0]])
    assert float(bond_energy(s, x)) == pytest.approx(
        0.5 * k2 * 0.01**2, rel=1e-4)
    # the built alanine system uses exactly this conversion
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    system, _ = build_system(topo)
    names = list(topo.atom_types)
    bonds = np.asarray(system.bond_idx)
    ch_bonds = [
        b for b, (i, j) in enumerate(bonds)
        if {names[i], names[j]} == {"CT", "HC"}
    ]
    assert ch_bonds, "alanine has CT-HC bonds"
    got_k = float(np.asarray(system.bond_k)[ch_bonds[0]])
    got_r0 = float(np.asarray(system.bond_r0)[ch_bonds[0]])
    assert got_k == pytest.approx(k2, rel=1e-6)
    assert got_r0 == pytest.approx(r0, rel=1e-6)


def test_angle_and_torsion_tables():
    """Spot-check parm94/ff99SB constants (independent re-derivation)."""
    k_amber, t0_deg = ff.lookup_angle("HC", "CT", "HC")
    assert k_amber == pytest.approx(35.0)
    assert t0_deg == pytest.approx(109.50)
    # X-CA-CA-X: PK=14.5, divider 4, phase 180, n=2 (parm10 benzene)
    terms = ff.lookup_dihedral("HA", "CA", "CA", "HA")
    assert any(
        pk / div == pytest.approx(14.5 / 4) and n == 2 and phase == 180.0
        for (div, pk, phase, n) in terms
    )


@pytest.mark.slow
def test_gb_born_self_energy():
    """A single ion's GB energy is the Born equation:
    E = -0.5 ke (1 - 1/eps_w) q^2 / B with B = rho = R - offset
    (I = 0 for an isolated atom), plus the ACE SA term."""
    R = 0.15
    s = _tiny_system(charges=[1.0], gb_radii=[R], use_gb=True)
    e = float(gb_energy(s, jnp.zeros((1, 3))))
    B = R - s.gb_offset
    born = -0.5 * KE * (1 - 1 / 78.5) * 1.0 / B
    sa = s.surface_tension * (R + 0.14) ** 2 * (R / B) ** 6
    assert e == pytest.approx(born + sa, rel=1e-4)


def test_gb_screened_coulomb_limit():
    """At large separation f_GB -> r, so the cross term approaches the
    screened Coulomb -ke (1 - 1/eps) q1 q2 / r."""
    R = 0.15
    s = _tiny_system(charges=[1.0, -1.0], gb_radii=[R, R], use_gb=True)
    r = 3.0  # nm >> B
    e = float(gb_energy(s, jnp.array([[0.0, 0, 0], [r, 0, 0]])))
    B = R - s.gb_offset
    born = 2 * (-0.5 * KE * (1 - 1 / 78.5) / B)
    sa = 2 * s.surface_tension * (R + 0.14) ** 2 * (R / B) ** 6
    cross = KE * (1 - 1 / 78.5) * 1.0 / r  # -(q1 q2) = +1
    assert e == pytest.approx(born + sa + cross, rel=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("gb_model", ["obc2", "gbn2"])
def test_finite_difference_forces_alanine(gb_model):
    """Central-difference force oracle on the full alanine system in
    float64 (the reference's RMS < 5e-3 kJ/mol/nm criterion,
    tests/force/test_fd_vs_torchforce.py:84)."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    jax.config.update("jax_enable_x64", True)
    try:
        topo = build_topology(alanine_dipeptide_structure())
        system, positions = build_system(
            topo, gb_model=gb_model, dtype=jnp.float64
        )
        x0 = jnp.asarray(positions, jnp.float64)
        efn = jax.jit(lambda x: potential_energy(system, x))
        force = -np.asarray(jax.jit(jax.grad(lambda x: potential_energy(system, x)))(x0))
        h = 1e-6
        rng = np.random.default_rng(0)
        picks = rng.choice(x0.shape[0], size=6, replace=False)
        errs = []
        for i in picks:
            for d in range(3):
                xp = np.asarray(x0).copy(); xp[i, d] += h
                xm = np.asarray(x0).copy(); xm[i, d] -= h
                fd = -(float(efn(jnp.asarray(xp))) - float(efn(jnp.asarray(xm)))) / (2 * h)
                errs.append(fd - force[i, d])
        rms = float(np.sqrt(np.mean(np.square(errs))))
        assert rms < 5e-3, f"FD-vs-analytic RMS {rms} kJ/mol/nm"
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_alanine_ramachandran_basin_sanity():
    """Thermodynamic end-to-end oracle: at 300 K L-alanine dipeptide lives
    overwhelmingly at negative phi (alpha/beta basins). A kick-size or
    force-sign bug flattens the distribution (the round-1 half-kick bug
    doubled the configurational temperature and would fail this)."""
    import jax

    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.features.base import TopologyInfo
    from pmarlo_tpu.features.ramachandran import compute_ramachandran
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from pmarlo_tpu.md.minimize import minimize_energy
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    system, positions = build_system(topo)
    xmin, _ = minimize_energy(system, positions)
    state = thermalize(system, xmin, jax.random.PRNGKey(11), 300.0)
    state, frames = run_md(
        system, state, n_steps=30_000, dt=0.002, friction=1.0,
        temperature_K=300.0, report_interval=50,
    )
    pos = np.asarray(frames["positions"])[100:]  # discard 5k-step burn-in
    phi, psi, _ = compute_ramachandran(pos, TopologyInfo.from_topology(topo))
    frac_neg_phi = float(np.mean(phi < 0))  # degrees; sign test only
    assert frac_neg_phi > 0.8, (
        f"only {frac_neg_phi:.2f} of frames at phi<0 — ensemble is wrong"
    )
    # temperature equilibrated near the thermostat setpoint
    t_mean = float(np.asarray(frames["temperature"])[100:].mean())
    assert 260.0 < t_mean < 340.0
