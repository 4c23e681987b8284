"""Protein prep + bias potentials."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.bias import HarmonicExpansionBias, MetadynamicsBias, make_cv_bias_fn
from pmarlo_tpu.bias.harmonic import make_feature_cv_fn
from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.protein.protein import Protein, charge_at_pH, isoelectric_point


def test_protein_prepare_and_properties():
    p = Protein(alanine_dipeptide_structure()).prepare()
    props = p.get_properties()
    assert props["n_residues"] == 1  # one real residue (ALA) + caps
    assert props["n_atoms"] == 22
    assert props["sequence"] == "A"
    assert props["formal_charge"] == 0
    system, positions = p.create_system()
    assert system.n_atoms == 22


def test_charge_and_pi():
    # polyglutamate should be negative at pH 7; polylysine positive
    assert charge_at_pH(["GLU"] * 5, 7.0) < -3
    assert charge_at_pH(["LYS"] * 5, 7.0) > 3
    pi_acid = isoelectric_point(["GLU"] * 5)
    pi_base = isoelectric_point(["LYS"] * 5)
    assert pi_acid < 5 < pi_base


def test_protein_requires_prepare():
    p = Protein(alanine_dipeptide_structure())
    with pytest.raises(RuntimeError, match="prepare"):
        p.get_properties()


def test_harmonic_bias_gradients():
    bias = HarmonicExpansionBias(strength=2.0)
    cv_fn = lambda pos: jnp.stack([pos[0, 0], pos[1, 1]])
    f = make_cv_bias_fn(cv_fn, bias)
    x = jnp.ones((3, 3), jnp.float32)
    assert float(f(x)) == pytest.approx(4.0)
    g = jax.grad(f)(x)
    assert float(g[0, 0]) == pytest.approx(4.0)
    assert float(g[2, 2]) == 0.0


def test_metadynamics_ledger_and_welltempered():
    mtd = MetadynamicsBias(sigma=(0.1, 0.1), height=2.0, max_hills=8)
    st = mtd.init_state(2)
    cv = jnp.asarray([0.0, 0.0], jnp.float32)
    st = mtd.deposit(st, cv)
    assert int(st.n_hills) == 1
    assert float(mtd.energy(st, cv)) == pytest.approx(2.0)
    # well-tempered: second hill at the same point is damped
    wt = MetadynamicsBias(
        sigma=(0.1, 0.1), height=2.0, max_hills=8, bias_factor=5.0,
        temperature_K=300.0,
    )
    st2 = wt.init_state(2)
    st2 = wt.deposit(st2, cv)
    h1 = float(st2.heights[0])
    st2 = wt.deposit(st2, cv)
    h2 = float(st2.heights[1])
    assert h2 < h1


def test_metadynamics_capacity_saturation():
    mtd = MetadynamicsBias(sigma=(0.1,), height=1.0, max_hills=3)
    st = mtd.init_state(1)
    for i in range(5):
        st = mtd.deposit(st, jnp.asarray([float(i)], jnp.float32))
    assert int(st.n_hills) == 3
    # first three hills retained, extras dropped
    np.testing.assert_allclose(np.asarray(st.centers[:3, 0]), [0, 1, 2])


def test_metadynamics_reproject():
    mtd = MetadynamicsBias(sigma=(0.1,), height=1.0, max_hills=4)
    st = mtd.init_state(1)
    st = mtd.deposit(st, jnp.asarray([1.0], jnp.float32))
    st2 = mtd.reproject(st, lambda c: 2.0 * c)
    assert float(st2.centers[0, 0]) == pytest.approx(2.0)
    assert int(st2.n_hills) == 1


@pytest.mark.slow
def test_biased_md_shifts_sampling(alanine_system, topology_info):
    """Bias actually steers dynamics: harmonic wall on the phi dihedral."""
    from pmarlo_tpu.features.builtins import phi_psi_indices
    from pmarlo_tpu.md.integrate import run_md, thermalize

    system, positions, _ = alanine_system
    phi_q, _, _ = phi_psi_indices(
        topology_info.atom_names, topology_info.residue_ids
    )
    quad = jnp.asarray(phi_q[0])

    def phi_of(pos):
        from pmarlo_tpu.md.forces import dihedral_angles

        return dihedral_angles(pos[None].reshape(1, -1, 3) if pos.ndim == 2 else pos,
                               quad[None])[0]

    def phi_single(pos):
        from pmarlo_tpu.md.forces import dihedral_angles

        return dihedral_angles(pos, quad[None])[0]

    target = 1.0  # rad
    bias = lambda pos: 500.0 * (phi_single(pos) - target) ** 2
    state = thermalize(system, positions, jax.random.PRNGKey(0), 300.0)
    final, frames = run_md(
        system, state, n_steps=1500, dt=0.001, friction=2.0,
        temperature_K=300.0, report_interval=100, bias_fn=bias,
    )
    last_pos = np.asarray(final.positions)
    from pmarlo_tpu.md.forces import dihedral_angles

    phi_end = float(np.asarray(dihedral_angles(jnp.asarray(last_pos), quad[None]))[0])
    assert abs(phi_end - target) < 0.5
