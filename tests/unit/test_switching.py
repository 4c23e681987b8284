"""OpenMM-parity LJ switching function (``switch_distance``).

OpenMM's ``NonbondedForce.setUseSwitchingFunction``/``setSwitchingDistance``
(an optional knob of the createSystem call the reference relies on at
/root/reference/src/pmarlo/protein/protein.py:733) multiplies the
unshifted LJ energy by a quintic smoothstep on [r_switch, r_cutoff] so
energy AND force go continuously to zero at the cutoff. Here: the
smoothstep math itself (md/forces.py lj_switch), parity of both Pallas
kernels against the dense XLA oracle with switching active, the
switching-aware dispersion tail, and the validation surface."""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.forces import lj_switch, potential_energy


def _water(resid, origin, chain="W"):
    ox, oy, oz = origin
    mk = lambda n, x, y, z, e: PDBAtom(
        name=n, resname="HOH", resid=resid, chain=chain,
        xyz=(x, y, z), element=e)
    return PDBResidue(name="HOH", resid=resid, chain=chain, atoms=[
        mk("O", ox, oy, oz, "O"),
        mk("H1", ox + 0.09572, oy, oz, "H"),
        mk("H2", ox - 0.02399, oy + 0.09266, oz, "H"),
    ])


def _water_box(n_side=5, spacing=0.31):
    residues = []
    rid = 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                residues.append(_water(
                    rid, (0.15 + i * spacing, 0.15 + j * spacing,
                          0.15 + k * spacing)))
                rid += 1
    s = PDBStructure(residues=residues)
    L = n_side * spacing + 0.1
    return s, (L, L, L)


@pytest.fixture(scope="module")
def switched_water_system():
    s, box = _water_box(5)
    system, x = build_system(
        s, box=box, cutoff=0.45, switch_distance=0.35, hydrogen_mass=None
    )
    return system, jnp.asarray(x, jnp.float32)


def test_lj_switch_shape():
    r_sw, rc = 0.35, 0.45
    r = jnp.asarray([0.1, 0.35, 0.40, 0.45, 0.60])
    s, ds = lj_switch(r, r_sw, rc)
    s = np.asarray(s)
    ds = np.asarray(ds)
    # identity below the switch distance, zero at/after the cutoff
    np.testing.assert_allclose(s[[0, 1]], 1.0, atol=2e-6)
    np.testing.assert_allclose(ds[[0, 1]], 0.0, atol=1e-5)
    np.testing.assert_allclose(s[[3, 4]], 0.0, atol=2e-6)
    np.testing.assert_allclose(ds[[3, 4]], 0.0, atol=1e-5)
    assert 0.0 < s[2] < 1.0 and ds[2] < 0.0
    # interior derivative matches finite differences
    rr = jnp.linspace(0.355, 0.445, 7)
    h = 1e-4
    fd = (np.asarray(lj_switch(rr + h, r_sw, rc)[0])
          - np.asarray(lj_switch(rr - h, r_sw, rc)[0])) / (2 * h)
    # f32 FD: cancellation noise ~eps/h ~ 1e-3 relative
    np.testing.assert_allclose(np.asarray(lj_switch(rr, r_sw, rc)[1]),
                               fd, atol=5e-3, rtol=5e-3)


def test_switch_validation():
    s, box = _water_box(3)
    with pytest.raises(ValueError, match="switch_distance"):
        build_system(s, box=(1.5, 1.5, 1.5), cutoff=0.45,
                     switch_distance=0.45)
    with pytest.raises(ValueError, match="switch_distance"):
        build_system(s, box=(1.5, 1.5, 1.5), cutoff=0.45,
                     switch_distance=-0.1)
    with pytest.raises(ValueError, match="periodic"):
        build_system(s, switch_distance=0.35)


def test_switched_energy_differs_only_in_lj_tail(switched_water_system):
    """Below r_sw the switched LJ is the UNSHIFTED potential: the
    switched energy differs from the shifted-truncation energy, and the
    difference is bounded by the number of within-cutoff pairs times the
    shift scale — a sanity check that only the LJ term moved."""
    system, x = switched_water_system
    import dataclasses
    unswitched = dataclasses.replace(system, switch_distance=None)
    e_sw = float(potential_energy(system, x))
    e_ref = float(potential_energy(unswitched, x))
    assert e_sw != e_ref
    # electrostatics dominate a water box; the LJ switch moves the total
    # by a small amount only
    assert abs(e_sw - e_ref) < 0.05 * abs(e_ref)


@pytest.mark.slow
def test_cell_kernel_switch_parity(switched_water_system):
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    system, x = switched_water_system
    fn = build_cell_force_fn(system, interpret=True)
    e, f = fn(x)
    e_ref, g_ref = jax.value_and_grad(
        lambda p: potential_energy(system, p)
    )(x)
    assert abs(float(e) - float(e_ref)) < 0.05, (float(e), float(e_ref))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.05, rtol=1e-3
    )


def test_dense_kernel_switch_parity(switched_water_system):
    from pmarlo_tpu.md.pallas_periodic import build_periodic_force_fn

    system, x = switched_water_system
    fn = build_periodic_force_fn(system, interpret=True)
    e, f = fn(x)
    e_ref, g_ref = jax.value_and_grad(
        lambda p: potential_energy(system, p)
    )(x)
    assert abs(float(e) - float(e_ref)) < 0.05, (float(e), float(e_ref))
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_ref), atol=0.05, rtol=1e-3
    )


@pytest.mark.slow
def test_pme_switch_parity(switched_water_system):
    """Cell kernel in PME mode WITH switching vs the composed dense
    oracle: switched pure-LJ dense path (charges zeroed — the dense
    oracle reads system.switch_distance) + dense Ewald electrostatics
    (test_pallas_cells.py::test_pme_mode_parity_water pattern). Closes
    the one engine/option combination the RF parity tests don't cover."""
    import dataclasses

    from pmarlo_tpu.constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 as KE
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn
    from pmarlo_tpu.md.pme import (
        background_energy,
        ewald_alpha,
        real_space_energy_dense,
        reciprocal_energy,
        self_energy,
    )

    system, x = switched_water_system
    fn = build_cell_force_fn(system, interpret=True, electrostatics="pme",
                             ewald_shift=False)  # exact-Ewald oracle parity
    e, f = fn(x)
    assert np.isfinite(float(e)) and np.isfinite(np.asarray(f)).all()

    box = tuple(float(b) for b in system.box)
    rc = float(system.cutoff)
    alpha = ewald_alpha(rc)
    shape = fn.pme_mesh_shape
    order = fn.pme_order
    q = jnp.asarray(system.charges, jnp.float32)

    sys_lj = dataclasses.replace(
        system, charges=jnp.zeros_like(jnp.asarray(system.charges))
    )
    e_lj_ref, g_lj_ref = jax.value_and_grad(
        lambda p: potential_energy(sys_lj, p)
    )(x)

    se = np.asarray(system.scale_elec)
    excl = jnp.asarray((se < 1.0).astype(np.float32))

    def e_elec(p):
        er = real_space_energy_dense(p, q, box, rc, alpha,
                                     exclude_mask=excl)
        em = reciprocal_energy(p, q, box, alpha, shape, order)
        iu = np.triu_indices(se.shape[0], k=1)
        keep = se[iu] < 1.0
        ei = jnp.asarray(iu[0][keep])
        ej = jnp.asarray(iu[1][keep])
        sev = jnp.asarray(se[iu][keep].astype(np.float32))
        L = jnp.asarray(box, jnp.float32)
        d = p[ei] - p[ej]
        d = d - L * jnp.round(d / L)
        r = jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-12)
        qq = q[ei] * q[ej]
        corr = jnp.sum(sev * KE * qq / r
                       - KE * qq * jax.lax.erf(alpha * r) / r)
        return (er + em + corr + self_energy(q, alpha)
                + background_energy(q, box, alpha))

    e_el_ref, g_el_ref = jax.value_and_grad(e_elec)(x)
    e_ref = float(e_lj_ref) + float(e_el_ref)
    assert abs(float(e) - e_ref) < max(0.3, 2e-4 * abs(e_ref)), (
        float(e), e_ref
    )
    np.testing.assert_allclose(
        np.asarray(f), -np.asarray(g_lj_ref + g_el_ref), atol=1.0, rtol=5e-3
    )


def test_switch_forces_vanish_at_cutoff(switched_water_system):
    """The point of switching: per-pair LJ force is continuous (-> 0)
    at the cutoff. Checked through the smoothstep-scaled pair force of
    an isolated O-O pair straddling the cutoff."""
    system, _ = switched_water_system
    rc = float(system.cutoff)
    r_sw = float(system.switch_distance)
    sig = float(np.asarray(system.lj_sigma)[0])
    eps = float(np.asarray(system.lj_eps)[0])

    def pair_e(r):
        sr6 = (sig / r) ** 6
        return 4.0 * eps * (sr6 * sr6 - sr6) * lj_switch(r, r_sw, rc)[0]

    g = jax.grad(pair_e)
    # smooth approach to zero at rc from below; identical to raw LJ below
    assert abs(float(g(rc - 1e-4))) < 1e-2
    raw = jax.grad(lambda r: 4.0 * eps * ((sig / r) ** 12 - (sig / r) ** 6))
    np.testing.assert_allclose(float(g(0.9 * r_sw)),
                               float(raw(0.9 * r_sw)), rtol=1e-6)


def test_dispersion_tail_switch_aware(switched_water_system):
    import dataclasses

    from pmarlo_tpu.md.dispersion import dispersion_coefficient

    system, _ = switched_water_system
    c_sw = dispersion_coefficient(system)
    c_plain = dispersion_coefficient(
        dataclasses.replace(system, switch_distance=None))
    # the switch removes attractive LJ inside [r_sw, rc]; the tail term
    # must compensate with MORE negative energy
    assert c_sw < c_plain < 0.0
    # r_sw -> rc recovers the plain truncation integral
    c_limit = dispersion_coefficient(
        dataclasses.replace(system, switch_distance=float(system.cutoff)
                            - 1e-9))
    np.testing.assert_allclose(c_limit, c_plain, rtol=1e-6)


@pytest.mark.slow
def test_run_segment_switch_distance(tmp_path):
    """End-to-end: a solvated segment accepts switch_distance and stays
    finite; the implicit path refuses it loudly."""
    from pmarlo_tpu.io.pdb import write_pdb
    from pmarlo_tpu.md.simulation import run_segment

    s, box = _water_box(3)
    pdb = tmp_path / "wat.pdb"
    atoms = [a for r in s.residues for a in r.atoms]
    write_pdb(str(pdb), np.asarray([a.xyz for a in atoms]),
              [a.name for a in atoms], [a.resname for a in atoms],
              [a.resid for a in atoms], box=box)
    res = run_segment(str(pdb), n_steps=10, report_interval=5,
                      minimize_iterations=5, cutoff=0.45,
                      switch_distance=0.35, nonbonded="cells", seed=1)
    assert np.isfinite(np.asarray(res["positions"])).all()
    assert np.isfinite(float(res["potential_energy"][-1]))


def test_protein_create_system_switch_refusal():
    """Protein.create_system refuses switch_distance on the implicit
    (NoCutoff) path; the explicit pass-through is asserted in
    test_explicit_solvent.py::test_solvated_pdb_round_trip."""
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.protein.protein import Protein

    p = Protein(alanine_dipeptide_structure()).prepare()
    with pytest.raises(ValueError, match="switch_distance"):
        p.create_system(switch_distance=0.35)


def test_remd_refuses_switch_on_implicit_path():
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.remd.remd import run_replica_exchange

    with pytest.raises(ValueError, match="switch_distance"):
        run_replica_exchange(alanine_dipeptide_structure(), n_steps=10,
                             switch_distance=0.35)
