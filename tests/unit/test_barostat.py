"""Monte-Carlo barostat (md/barostat.py) correctness.

Physics oracles:
* ideal gas — with U == 0 the MC volume moves sample
  p(V) dV ~ V^N exp(-beta P V) dV, so <V> = (N+1) kT / P exactly;
* rigid molecule scaling — intramolecular distances are invariant
  under the volume move by construction;
* dynamic-box cell kernel — force_fn.dynamic(x, static_box) must
  reproduce the static-box path, and dynamic(x', box') must match a
  FRESH static build at box' (the NPT acceptance energies are real).
"""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from pmarlo_tpu.constants import BOLTZMANN_CONSTANT_KJ_PER_MOL
from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
from pmarlo_tpu.md.barostat import (
    BAR_TO_KJ_PER_MOL_NM3,
    init_barostat,
    make_volume_move,
    molecule_ids,
    run_npt,
    scale_positions,
)


def _water_box(n_side=5, spacing=0.31):
    residues, rid = [], 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                ox = 0.15 + i * spacing
                oy = 0.15 + j * spacing
                oz = 0.15 + k * spacing
                mk = lambda n, x, y, z, e: PDBAtom(
                    name=n, resname="HOH", resid=rid, chain="W",
                    xyz=(x, y, z), element=e)
                residues.append(PDBResidue(
                    name="HOH", resid=rid, chain="W", atoms=[
                        mk("O", ox, oy, oz, "O"),
                        mk("H1", ox + 0.09572, oy, oz, "H"),
                        mk("H2", ox - 0.02399, oy + 0.09266, oz, "H"),
                    ]))
                rid += 1
    L = n_side * spacing + 0.1
    return PDBStructure(residues=residues), (L, L, L)


def test_ideal_gas_volume_distribution():
    """U == 0: <V> = (N_mol + 1) kT / P (NPT partition function of the
    ideal gas; the +1 comes from the V^N ln-Jacobian term)."""
    n_mol = 50
    T = 300.0
    kT = BOLTZMANN_CONSTANT_KJ_PER_MOL * T
    box0 = jnp.asarray([2.0, 2.0, 2.0], jnp.float32)
    v_target = float(box0[0] * box0[1] * box0[2])
    # choose P so the stationary mean equals the initial volume
    p_kj = (n_mol + 1) * kT / v_target
    p_bar = p_kj / BAR_TO_KJ_PER_MOL_NM3

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n_mol, 3), jnp.float32, 0.0, 2.0)
    mol = np.arange(n_mol, dtype=np.int32)  # one atom per molecule
    masses = np.full(n_mol, 18.0, np.float32)
    move = make_volume_move(
        lambda xx, bb: jnp.asarray(0.0, jnp.float32),
        mol, masses, n_mol, pressure_bar=p_bar, temperature_K=T,
    )
    bstate = init_barostat(box0, jax.random.PRNGKey(1))

    @jax.jit
    def run(x, bstate):
        def body(carry, _):
            x, bs = carry
            x, bs, acc, _e = move(x, bs)
            v = bs.box[0] * bs.box[1] * bs.box[2]
            return (x, bs), v

        return jax.lax.scan(body, (x, bstate), None, length=4000)

    (x, bstate), vols = run(x, bstate)
    vols = np.asarray(vols)
    assert np.isfinite(vols).all()
    burn = vols[1000:]
    mean_v = float(burn.mean())
    # relative fluctuation 1/sqrt(N+1) ~ 14%; 3000 correlated samples
    # give a few-percent SEM — 12% band is ~4 sigma
    assert abs(mean_v - v_target) / v_target < 0.12, mean_v
    acc = float(bstate.n_accepted) / float(bstate.n_attempted)
    assert 0.2 < acc < 0.9, acc  # self-tuned toward ~50%


def test_scale_positions_rigid_molecules():
    rng = np.random.default_rng(0)
    # 4 molecules of 3 atoms each
    x = jnp.asarray(rng.normal(2.0, 1.0, (12, 3)), jnp.float32)
    mol = np.repeat(np.arange(4), 3).astype(np.int32)
    masses = np.asarray([16.0, 1.0, 1.0] * 4, np.float32)
    s = jnp.asarray(1.05, jnp.float32)
    x1 = scale_positions(x, s, mol, masses, 4)
    x1 = np.asarray(x1)
    x0 = np.asarray(x)
    for m in range(4):
        sl = slice(3 * m, 3 * m + 3)
        d0 = np.linalg.norm(x0[sl][:, None] - x0[sl][None], axis=-1)
        d1 = np.linalg.norm(x1[sl][:, None] - x1[sl][None], axis=-1)
        np.testing.assert_allclose(d1, d0, atol=1e-5)
        # COM scaled by s
        com0 = (masses[sl][:, None] * x0[sl]).sum(0) / masses[sl].sum()
        com1 = (masses[sl][:, None] * x1[sl]).sum(0) / masses[sl].sum()
        np.testing.assert_allclose(com1, 1.05 * com0, rtol=1e-5)


def test_molecule_ids_waters_and_protein():
    from pmarlo_tpu.md.forcefield import build_system

    s, box = _water_box(3)
    system, _ = build_system(s, box=box, cutoff=0.45, hydrogen_mass=None)
    ids = molecule_ids(system)
    assert ids.shape[0] == system.n_atoms
    assert ids.max() + 1 == 27  # one molecule per water
    # every water's three atoms share an id
    assert (ids.reshape(27, 3) == ids.reshape(27, 3)[:, :1]).all()


@pytest.mark.slow
def test_dynamic_box_matches_static(water_system_barostat):
    """dynamic(x, static_box) == static path; dynamic at a scaled box
    matches a FRESH static build at that box."""
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    system, x, structure, box = water_system_barostat
    fn = build_cell_force_fn(system, interpret=True)
    e0, f0 = fn(x)
    e1, f1 = fn.dynamic(x, jnp.asarray(box, jnp.float32))
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               atol=1e-4)

    # scaled box: molecules rigid-translated, box * s
    s = 1.02
    ids = molecule_ids(system)
    xs = scale_positions(x, jnp.asarray(s, jnp.float32), ids,
                         system.masses, int(ids.max()) + 1)
    box_s = tuple(float(b) * s for b in box)
    sys_s, _ = build_system(structure, box=box_s, cutoff=0.45,
                            hydrogen_mass=None)
    fn_s = build_cell_force_fn(sys_s, interpret=True)
    # only compare when the fresh grid matches the dynamic grid shape
    # (the whole point of the traced box is to keep the shape fixed)
    if fn_s.grid.n_slots == fn.grid.n_slots:
        e_ref, f_ref = fn_s(xs)
        e_dyn, f_dyn = fn.dynamic(xs, jnp.asarray(box_s, jnp.float32))
        np.testing.assert_allclose(float(e_dyn), float(e_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(f_dyn), np.asarray(f_ref),
                                   atol=1e-3)
    # a box that breaks the cutoff cover must poison, not silently drop
    bad_box = jnp.asarray([b * 0.5 for b in box], jnp.float32)
    e_bad, _ = fn.dynamic(x, bad_box)
    assert not np.isfinite(float(e_bad))


@pytest.fixture(scope="module")
def water_system_barostat():
    from pmarlo_tpu.md.forcefield import build_system

    s, box = _water_box(5)
    system, x = build_system(s, box=box, cutoff=0.45, hydrogen_mass=None)
    return system, jnp.asarray(x, jnp.float32), s, box


@pytest.mark.slow
def test_run_npt_water_smoke(water_system_barostat):
    """Short NPT run on the real cell kernel (interpret mode): box
    moves, stays finite, densities are physical, constraints hold."""
    from pmarlo_tpu.md.constraints import (
        build_h_constraints,
        strip_constrained_bonded,
    )
    from pmarlo_tpu.md.integrate import thermalize
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    system, x, _, _ = water_system_barostat
    spec = build_h_constraints(system)
    md_system = strip_constrained_bonded(system)
    fn = build_cell_force_fn(md_system, interpret=True)
    st = thermalize(system, x, jax.random.PRNGKey(0), 300.0)
    final, bstate, frames = run_npt(
        md_system, st, n_steps=20, dt=0.002, friction=1.0,
        temperature_K=300.0, pressure_bar=1.0, barostat_interval=5,
        report_interval=10, force_fn=fn, constraints=spec,
        full_system=system,
    )
    assert np.isfinite(np.asarray(frames["positions"])).all()
    dens = np.asarray(frames["density_g_cm3"])
    assert ((dens > 0.2) & (dens < 3.0)).all()
    assert int(bstate.n_attempted) == 4
    # rigid waters survived the volume moves
    xf = np.asarray(final.positions).reshape(-1, 3, 3)
    oh1 = np.linalg.norm(xf[:, 1] - xf[:, 0], axis=-1)
    np.testing.assert_allclose(oh1, 0.09572, atol=2e-3)


def test_dispersion_coefficient_single_type():
    """One LJ class: C = N^2 * 4 eps [sig^12/(9 rc^9) - sig^6/(3 rc^3)],
    checked against the closed form and a brute-force pair sum."""
    import dataclasses

    from pmarlo_tpu.md.dispersion import dispersion_coefficient

    class Sys:
        cutoff = 0.9
        lj_sigma = np.full(7, 0.3151, np.float64)
        lj_eps = np.full(7, 0.6364, np.float64)

    rc, sig, eps, n = 0.9, 0.3151, 0.6364, 7
    expect = n * n * 4.0 * eps * (
        sig**12 / (9 * rc**9) - sig**6 / (3 * rc**3))
    got = dispersion_coefficient(Sys())
    np.testing.assert_allclose(got, expect, rtol=1e-12)

    # mixed classes: brute force over all ordered pairs
    rng = np.random.default_rng(3)
    class Sys2:
        cutoff = 1.1
        lj_sigma = rng.uniform(0.1, 0.4, 9)
        lj_eps = rng.uniform(0.0, 1.0, 9)

    s2 = Sys2()
    brute = 0.0
    for i in range(9):
        for j in range(9):
            sij = 0.5 * (s2.lj_sigma[i] + s2.lj_sigma[j])
            eij = np.sqrt(s2.lj_eps[i] * s2.lj_eps[j])
            brute += 4 * eij * (sij**12 / (9 * 1.1**9)
                                - sij**6 / (3 * 1.1**3))
    np.testing.assert_allclose(dispersion_coefficient(s2), brute,
                               rtol=1e-10)


@pytest.mark.slow
def test_dispersion_energy_scales_inverse_volume(water_system_barostat):
    """With the tail term on, E(box) - E_notail(box) = 2 pi C / V for
    the dynamic path — the barostat feels dP = -dE/dV."""
    from pmarlo_tpu.md.dispersion import dispersion_coefficient
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    system, x, _, box = water_system_barostat
    fn0 = build_cell_force_fn(system, interpret=True)
    fn1 = build_cell_force_fn(system, interpret=True,
                              dispersion_correction=True)
    c2pi = 2.0 * np.pi * dispersion_coefficient(system)
    b = jnp.asarray(box, jnp.float32)
    v = float(b[0] * b[1] * b[2])
    e0 = float(fn0.dynamic(x, b)[0])
    e1 = float(fn1.dynamic(x, b)[0])
    np.testing.assert_allclose(e1 - e0, c2pi / v, rtol=1e-3)
    # forces untouched
    f0 = np.asarray(fn0(x)[1])
    f1 = np.asarray(fn1(x)[1])
    np.testing.assert_allclose(f1, f0, atol=1e-5)


@pytest.mark.slow
def test_run_segment_npt_resume_continues_barostat(tmp_path):
    """NPT chaining: resuming without box info is an error (the kernel
    grid would rebuild at the CRYST1 box while positions are at the
    evolved volume); passing final_barostat_state continues the box,
    the tuned proposal width, and the move PRNG stream."""
    import pmarlo_tpu
    from pmarlo_tpu.io.pdb import write_pdb

    s, box = _water_box(5)
    pdb = str(tmp_path / "wat.pdb")
    write_pdb(pdb, s.coordinates(),
              [a.name for r in s.residues for a in r.atoms],
              [a.resname for r in s.residues for a in r.atoms],
              [a.resid for r in s.residues for a in r.atoms],
              box=box)
    first = pmarlo_tpu.run_segment(
        pdb, n_steps=20, report_interval=10, ensemble="npt",
        nonbonded="cells", cutoff=0.45, barostat_interval=5,
        minimize_iterations=20, seed=3,
    )
    assert "final_barostat_state" in first
    with pytest.raises(ValueError, match="initial_barostat_state"):
        pmarlo_tpu.run_segment(
            pdb, n_steps=20, report_interval=10, ensemble="npt",
            nonbonded="cells", cutoff=0.45, barostat_interval=5,
            initial_state=first["final_state"],
        )
    second = pmarlo_tpu.run_segment(
        pdb, n_steps=20, report_interval=10, ensemble="npt",
        nonbonded="cells", cutoff=0.45, barostat_interval=5,
        initial_state=first["final_state"],
        initial_barostat_state=first["final_barostat_state"],
    )
    assert np.isfinite(np.asarray(second["positions"])).all()
    # the second segment starts from the first's evolved box, not CRYST1
    np.testing.assert_allclose(np.asarray(second["box"])[0],
                               first["final_box"], rtol=0.02)
    # and its barostat state kept counting from the continued stream
    bs = second["final_barostat_state"]
    assert int(bs.n_attempted) == int(
        first["final_barostat_state"].n_attempted) + 4


def test_run_segment_npt_validation(tmp_path):
    """NPT demands an explicit periodic input and a cell engine."""
    import tempfile

    import pmarlo_tpu
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.io.pdb import write_pdb

    s = alanine_dipeptide_structure()
    pdb = str(tmp_path / "ala.pdb")
    write_pdb(pdb, s.coordinates(),
              [a.name for r in s.residues for a in r.atoms],
              [a.resname for r in s.residues for a in r.atoms],
              [a.resid for r in s.residues for a in r.atoms])
    with pytest.raises(ValueError, match="explicit-solvent"):
        pmarlo_tpu.run_segment(pdb, n_steps=10, report_interval=10,
                               ensemble="npt")
    with pytest.raises(ValueError, match="ensemble must be"):
        pmarlo_tpu.run_segment(pdb, n_steps=10, report_interval=10,
                               ensemble="nvk")


def test_volume_move_reports_post_decision_energy():
    """move() must return the energy of the configuration it returns —
    e1 when accepted, e0 when rejected — so reported frames pair
    (positions, box, E) consistently."""
    import jax
    import jax.numpy as jnp

    n = 8
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, 3), jnp.float32, 0.0, 1.5)
    mol = np.arange(n, dtype=np.int32)
    masses = np.full(n, 18.0, np.float32)

    def energy_fn(xx, bb):
        # box-dependent energy so e0 != e1 for any volume change
        return 10.0 * (bb[0] * bb[1] * bb[2])

    move = make_volume_move(energy_fn, mol, masses, n,
                            pressure_bar=1.0, temperature_K=300.0)
    bs = init_barostat(np.asarray([1.5, 1.5, 1.5], np.float32),
                       jax.random.PRNGKey(7))
    for _ in range(10):
        x, bs, acc, e_now = jax.jit(move)(x, bs)
        expected = energy_fn(x, bs.box)
        np.testing.assert_allclose(float(e_now), float(expected), rtol=1e-5)


@pytest.mark.slow
def test_run_segment_npt_auto_resolves_to_cells(tmp_path):
    """ensemble='npt' with the default nonbonded='auto' must select the
    cell engine even below the 3000-atom crossover (the barostat's
    dynamic box only exists there)."""
    import pmarlo_tpu
    from pmarlo_tpu.io.pdb import write_pdb

    s, box = _water_box(4)
    pdb = str(tmp_path / "w.pdb")
    write_pdb(pdb, s.coordinates(),
              [a.name for r in s.residues for a in r.atoms],
              [a.resname for r in s.residues for a in r.atoms],
              [a.resid for r in s.residues for a in r.atoms], box=box)
    res = pmarlo_tpu.run_segment(
        pdb, n_steps=10, report_interval=10, ensemble="npt",
        cutoff=0.45, barostat_interval=5, minimize_iterations=10, seed=2,
    )
    assert "final_barostat_state" in res
    assert np.isfinite(np.asarray(res["positions"])).all()


@pytest.mark.slow
def test_biased_npt_shifts_density_equilibrium():
    """NPT + CV bias (VERDICT r3 item 5): a confining bias must reach
    BOTH legs — the Langevin force (configurations compress) and the MC
    acceptance ΔU (compressed volumes become favorable), shifting the
    sampled volume DOWN vs the unbiased run with identical seeds."""
    import jax.numpy as jnp

    from pmarlo_tpu.md.constraints import (
        build_h_constraints,
        strip_constrained_bonded,
    )
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import thermalize
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn

    s, box = _water_box(5)
    system, x = build_system(s, box=box, cutoff=0.45, hydrogen_mass=None)
    spec = build_h_constraints(system)
    md_system = strip_constrained_bonded(system)
    fn = build_cell_force_fn(md_system, interpret=True)
    st = thermalize(system, jnp.asarray(x, jnp.float32),
                    jax.random.PRNGKey(7), 300.0)

    center = jnp.asarray(np.asarray(x).mean(axis=0), jnp.float32)

    def bias(xx):
        # strong isotropic harmonic well toward the initial COM:
        # favors compressed configurations at every volume
        return 50.0 * jnp.sum((xx - center) ** 2)

    kwargs = dict(
        n_steps=60, dt=0.001, friction=2.0, temperature_K=300.0,
        pressure_bar=1.0, barostat_interval=5, report_interval=10,
        force_fn=fn, constraints=spec, full_system=system, seed=11,
    )
    _, b_plain, fr_plain = run_npt(md_system, st, **kwargs)
    _, b_bias, fr_bias = run_npt(md_system, st, bias_fn=bias, **kwargs)

    assert np.isfinite(np.asarray(fr_bias["positions"])).all()
    v_plain = np.prod(np.asarray(fr_plain["box"]), axis=1)
    v_bias = np.prod(np.asarray(fr_bias["box"]), axis=1)
    # the confining bias must pull the sampled volume below the
    # unbiased trajectory (identical PRNG streams → paired comparison)
    assert v_bias.mean() < v_plain.mean()
    # and the reported potential includes the bias term (strictly
    # larger than the unbiased potential at comparable configurations)
    assert (np.asarray(fr_bias["potential_energy"]).mean()
            > np.asarray(fr_plain["potential_energy"]).mean())
    # rigid waters survived biased volume moves
    xf = np.asarray(fr_bias["positions"])[-1].reshape(-1, 3, 3)
    oh1 = np.linalg.norm(xf[:, 1] - xf[:, 0], axis=-1)
    np.testing.assert_allclose(oh1, 0.09572, atol=2e-3)


def test_run_segment_npt_accepts_bias(tmp_path):
    """The NPT+bias guard is gone: run_segment composes the bias into
    constant-pressure sampling end to end."""
    import pmarlo_tpu
    from pmarlo_tpu.io.pdb import write_pdb

    s, box = _water_box(4)
    pdb = str(tmp_path / "wat.pdb")
    write_pdb(pdb, s.coordinates(),
              [a.name for r in s.residues for a in r.atoms],
              [a.resname for r in s.residues for a in r.atoms],
              [a.resid for r in s.residues for a in r.atoms],
              box=box)
    import jax.numpy as jnp

    def bias(xx):
        return 1.0 * jnp.sum((xx[0] - xx[3]) ** 2)

    res = pmarlo_tpu.run_segment(
        pdb, n_steps=20, report_interval=10, ensemble="npt",
        nonbonded="cells", cutoff=0.45, barostat_interval=5,
        minimize_iterations=20, seed=3, bias_fn=bias,
    )
    assert np.isfinite(np.asarray(res["positions"])).all()
    assert "final_barostat_state" in res
