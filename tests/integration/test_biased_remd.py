"""The flagship in-graph bias path: DeepTICA CV bias fused into REMD.

This is the capability the reference needed a TorchScript + openmm-torch
bridge for (SURVEY.md section 3.4); here it is pure function composition:
positions -> phi/psi features -> DeepTICA MLP -> bias energy, and bias
forces come from the same jax.grad as the physical forces inside the
vmapped REMD scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.bias import HarmonicExpansionBias, MetadynamicsBias, make_cv_bias_fn
from pmarlo_tpu.bias.harmonic import make_feature_cv_fn, make_phi_psi_feature_fn
from pmarlo_tpu.features.featurize import featurize_trajectory
from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica
from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange


@pytest.fixture(scope="module")
def alanine():
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.features.base import TopologyInfo
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    system, positions = build_system(topo)
    return system, positions, topo, TopologyInfo.from_topology(topo)


@pytest.mark.slow
def test_deeptica_biased_remd_end_to_end(alanine):
    system, positions, topo, info = alanine

    # 1. unbiased seed sampling
    cfg = RemdConfig(n_replicas=4, t_min=300, t_max=500,
                     exchange_frequency=100, report_interval=50, seed=0)
    remd = ReplicaExchange(system, positions, cfg)
    seed_run = remd.run(n_steps=2000)

    # 2. train a DeepTICA CV on the cos/sin phi-psi features
    trajs = [seed_run.demuxed_trajectory(r) for r in range(2)]
    feats = [
        np.asarray(featurize_trajectory(t, "phi_psi", info, cos_sin_expand=True)[0],
                   dtype=np.float32)
        for t in trajs
    ]
    model = train_deeptica(feats, DeepTICAConfig(
        lag=2, n_out=1, hidden=(8,), max_epochs=4, batch_size=16,
        early_stopping_patience=4, val_fraction=0.3, seed=1,
    ))

    # 3. compose positions -> features -> CV -> bias energy
    feature_fn = make_phi_psi_feature_fn(info.atom_names, info.residue_ids)
    cv_fn = make_feature_cv_fn(feature_fn, model.as_function())
    bias_fn = make_cv_bias_fn(cv_fn, HarmonicExpansionBias(strength=2.0))

    # bias energy + gradient are finite and nonzero through the whole chain
    e = bias_fn(positions)
    g = jax.grad(bias_fn)(positions)
    assert np.isfinite(float(e))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0

    # 4. biased REMD runs stably
    biased = ReplicaExchange(system, positions, cfg, bias_fn=bias_fn)
    out = biased.run(n_steps=1000)
    assert np.isfinite(out.positions).all()
    assert 0.0 <= out.mean_acceptance <= 1.0


@pytest.mark.slow
def test_metadynamics_biased_md(alanine):
    """Well-tempered metadynamics in DeepTICA CV space inside plain MD."""
    from pmarlo_tpu.md.integrate import run_md, thermalize

    system, positions, topo, info = alanine
    feature_fn = make_phi_psi_feature_fn(info.atom_names, info.residue_ids)
    # identity 'CV': first two features directly
    cv_fn = lambda pos: feature_fn(pos)[:2]
    mtd = MetadynamicsBias(sigma=(0.3, 0.3), height=2.0, max_hills=32,
                           bias_factor=6.0, temperature_K=300.0)
    hills = mtd.init_state(2)
    state = thermalize(system, positions, jax.random.PRNGKey(0), 300.0)
    for _ in range(3):
        bias_fn = mtd.bias_fn(hills, cv_fn)
        state, frames = run_md(
            system, state, n_steps=200, dt=0.002, friction=1.0,
            temperature_K=300.0, report_interval=100, bias_fn=bias_fn,
        )
        hills = mtd.deposit(hills, cv_fn(state.positions))
    assert int(hills.n_hills) == 3
    assert np.isfinite(np.asarray(state.positions)).all()
    # deposited bias is felt: energy at the current CV point is positive
    assert float(mtd.energy(hills, cv_fn(state.positions))) > 0
