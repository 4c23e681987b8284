"""Fused Pallas MD kernel: plane-math equivalence (CPU) and, on TPU,
kernel-vs-XLA trajectory agreement. The plane functions are pure jnp, so
their math is fully checked on the CPU backend; the Mosaic lowering path is
exercised only when a TPU is present.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmarlo_tpu.md.analytic import energy_and_forces, make_dense_params
from pmarlo_tpu.md import pallas_md as PM


def _packed_consts(system, p):
    n = system.n_atoms
    RHO, TAU, SUMJ = PM._pair_pack_matrices(n)
    flat = lambda m: jnp.asarray(np.asarray(m, np.float32).reshape(1, n * n))
    rho_col = np.asarray(p.gb_rho, np.float32)
    sr_col = np.asarray(p.gb_sr, np.float32)
    return {
        "RHO": jnp.asarray(RHO), "TAU": jnp.asarray(TAU),
        "SUMJ": jnp.asarray(SUMJ), "TAUT": jnp.asarray(TAU.T.copy()),
        "lj_a_flat": flat(p.lj_a), "lj_b_flat": flat(p.lj_b),
        "qq_scaled_flat": flat(p.qq_scaled), "qq_full_flat": flat(p.qq_full),
        "eye_flat": flat(np.eye(n)),
        "gb_rho_flat_i": flat(np.broadcast_to(rho_col[:, None], (n, n))),
        "gb_sr_flat_j": flat(np.broadcast_to(sr_col[None, :], (n, n))),
        "gb_rho": jnp.asarray(p.gb_rho)[None, :],
        "gb_alpha": jnp.asarray(p.gb_alpha)[None, :],
        "gb_beta": jnp.asarray(p.gb_beta)[None, :],
        "gb_gamma": jnp.asarray(p.gb_gamma)[None, :],
        "use_neck": False,
    }


def _consts(system, p):
    S_all, offsets = PM._pack_selectors(p)
    return {
        "S_all": jnp.asarray(S_all),
        "bond_k": jnp.asarray(p.bond_k)[None, :],
        "bond_r0": jnp.asarray(p.bond_r0)[None, :],
        "angle_k": jnp.asarray(p.angle_k)[None, :],
        "angle_t0": jnp.asarray(p.angle_t0)[None, :],
        "tor_k": jnp.asarray(p.tor_k)[None, :],
        "tor_n": jnp.asarray(p.tor_n)[None, :],
        "tor_nmask": jnp.asarray(PM._torsion_n_masks(np.asarray(p.tor_n))),
        "tor_sign": jnp.asarray(PM._torsion_signs(np.asarray(p.tor_phase)))[None, :],
        "lj_a": jnp.asarray(p.lj_a)[None],
        "lj_b": jnp.asarray(p.lj_b)[None],
        "qq_scaled": jnp.asarray(p.qq_scaled)[None],
        "qq_full": jnp.asarray(p.qq_full),
        "q": jnp.asarray(p.q)[None, :],
        "gb_rho": jnp.asarray(p.gb_rho)[None, :],
        "gb_sr": jnp.asarray(p.gb_sr)[None, :],
        "gb_radii": jnp.asarray(p.gb_radii)[None, :],
        "gb_alpha": jnp.asarray(p.gb_alpha)[None, :],
        "gb_beta": jnp.asarray(p.gb_beta)[None, :],
        "gb_gamma": jnp.asarray(p.gb_gamma)[None, :],
        "use_neck": False,
        "sa_coef": jnp.asarray(p.sa_coef)[None, :],
        "eye": jnp.eye(system.n_atoms, dtype=jnp.float32),
        "inv_m": (1.0 / jnp.asarray(p.masses))[None, :],
        "offsets": offsets,
        "gb_pref": float(p.gb_pref),
        "use_gb": system.use_gb,
    }


@pytest.mark.slow
def test_forces_planes_match_analytic(alanine_system):
    system, pos, _ = alanine_system
    p = make_dense_params(system)
    consts = _consts(system, p)
    R = 4
    x = jnp.broadcast_to(pos[None], (R,) + pos.shape) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (R,) + pos.shape
    )
    f0, f1, f2, e = PM._forces_planes(x[..., 0], x[..., 1], x[..., 2], consts)
    e_ref, f_ref = jax.vmap(lambda xi: energy_and_forces(p, xi))(x)
    f_plane = jnp.stack([f0, f1, f2], axis=-1)
    scale = float(jnp.abs(f_ref).max())
    assert float(jnp.abs(e[:, 0] - e_ref).max()) / float(jnp.abs(e_ref).max()) < 1e-4
    assert float(jnp.abs(f_plane - f_ref).max()) / scale < 1e-4


@pytest.mark.slow
def test_forces_planes_packed_match_analytic(alanine_system):
    system, pos, _ = alanine_system
    p = make_dense_params(system)
    consts = _consts(system, p)
    consts.update(_packed_consts(system, p))
    R = 4
    x = jnp.broadcast_to(pos[None], (R,) + pos.shape) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), (R,) + pos.shape
    )
    f0, f1, f2, e = PM._forces_planes_packed(
        x[..., 0], x[..., 1], x[..., 2], consts
    )
    e_ref, f_ref = jax.vmap(lambda xi: energy_and_forces(p, xi))(x)
    f_packed = jnp.stack([f0, f1, f2], axis=-1)
    scale = float(jnp.abs(f_ref).max())
    assert float(jnp.abs(e[:, 0] - e_ref).max()) / float(jnp.abs(e_ref).max()) < 1e-4
    assert float(jnp.abs(f_packed - f_ref).max()) / scale < 1e-4


@pytest.mark.slow
def test_forces_planes_vacuum(alanine_system):
    system, pos, _ = alanine_system
    vac = dataclasses.replace(system, use_gb=False)
    p = make_dense_params(vac)
    consts = _consts(vac, p)
    x = pos[None]
    f0, f1, f2, e = PM._forces_planes(x[..., 0], x[..., 1], x[..., 2], consts)
    e_ref, f_ref = energy_and_forces(p, pos)
    # vacuum energy is small (bonded sums cancel), so allow f32 headroom
    assert abs(float(e[0, 0]) - float(e_ref)) / max(abs(float(e_ref)), 1.0) < 5e-4


def test_torsion_tables_validate():
    with pytest.raises(ValueError, match="periodicities"):
        PM._torsion_n_masks(np.asarray([1.0, 5.0]))
    with pytest.raises(ValueError, match="phases"):
        PM._torsion_signs(np.asarray([0.5]))
    masks = PM._torsion_n_masks(np.asarray([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_array_equal(masks, np.eye(4, dtype=np.float32))
    signs = PM._torsion_signs(np.asarray([0.0, np.pi]))
    np.testing.assert_array_equal(signs, [1.0, -1.0])


def test_pallas_chunk_on_tpu(alanine_system):
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU for Mosaic lowering")
    system, pos, _ = alanine_system
    R = 4
    chunk = PM.build_pallas_chunk(
        system, dt=0.002, friction=1.0, n_steps=10, n_replicas=R
    )
    x = jnp.broadcast_to(pos[None], (R,) + pos.shape)
    v = jnp.zeros_like(x)
    xo, vo, eo = chunk(
        x, v, jnp.arange(R, dtype=jnp.int32), jnp.full((R,), 300.0)
    )
    assert np.isfinite(np.asarray(xo)).all()
    assert np.isfinite(np.asarray(eo)).all()


@pytest.mark.slow
def test_bias_planes_match_xla_autodiff(alanine_system, topology_info):
    """The in-kernel DeepTICA bias (manual backprop through the MLP chained
    into analytic dihedral gradients) must equal jax.grad of the XLA
    composition."""
    from pmarlo_tpu.bias import HarmonicExpansionBias, make_cv_bias_fn
    from pmarlo_tpu.bias.harmonic import (
        make_feature_cv_fn,
        make_phi_psi_feature_fn,
    )
    from pmarlo_tpu.features.builtins import phi_psi_indices
    from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica

    system, pos, topo = alanine_system
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 4)).astype(np.float32)
    model = train_deeptica(X, DeepTICAConfig(
        lag=2, n_out=2, hidden=(8,), max_epochs=2, batch_size=64,
        early_stopping_patience=2, seed=0,
    ))
    phi_q, psi_q, _ = phi_psi_indices(
        topology_info.atom_names, topology_info.residue_ids
    )
    quads = np.concatenate([phi_q, psi_q], 0)

    feature_fn = make_phi_psi_feature_fn(
        topology_info.atom_names, topology_info.residue_ids
    )
    cv_fn = make_feature_cv_fn(feature_fn, model.as_function())
    bias_fn = make_cv_bias_fn(cv_fn, HarmonicExpansionBias(strength=1.5))

    b_consts, b_statics, quads2 = PM._bias_consts(model, quads, 1.5)
    consts = {k: jnp.asarray(v) for k, v in b_consts.items()}
    consts.update(b_statics)
    consts["bias_S"] = jnp.asarray(
        PM._pack_selectors_for_quads(quads2, system.n_atoms)
    )
    R = 3
    x = jnp.broadcast_to(pos[None], (R,) + pos.shape) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (R,) + pos.shape
    )
    f0, f1, f2, e = PM._bias_planes(x[..., 0], x[..., 1], x[..., 2], consts)
    f_kernel = np.stack([np.asarray(f0), np.asarray(f1), np.asarray(f2)], -1)
    e_refs = np.asarray([float(bias_fn(xi)) for xi in x])
    f_refs = np.stack([-np.asarray(jax.grad(bias_fn)(xi)) for xi in x])
    scale = max(np.abs(f_refs).max(), 1e-6)
    assert np.abs(np.asarray(e)[:, 0] - e_refs).max() < 1e-3
    assert np.abs(f_kernel - f_refs).max() / scale < 1e-4


def test_bias_consts_validation():
    from pmarlo_tpu.ml.deeptica import DeepTICAConfig, DeepTICAModel, init_mlp_params

    params = init_mlp_params(jax.random.PRNGKey(0), 4, (8,), 2)
    model = DeepTICAModel(
        config=DeepTICAConfig(activation="gelu"),
        params=params,
        scaler_mean=np.zeros(4, np.float32),
        scaler_scale=np.ones(4, np.float32),
    )
    with pytest.raises(ValueError, match="tanh"):
        PM._bias_consts(model, np.zeros((2, 4), np.int64), 1.0)


def _tiny_model():
    from pmarlo_tpu.ml.deeptica import DeepTICAConfig, train_deeptica

    rng = np.random.default_rng(0)
    return train_deeptica(
        rng.normal(size=(400, 4)).astype(np.float32),
        DeepTICAConfig(lag=2, n_out=2, hidden=(8,), max_epochs=2,
                       batch_size=64, early_stopping_patience=2, seed=0),
    )


@pytest.mark.slow
def test_metadynamics_bias_planes_match_xla(alanine_system, topology_info):
    from pmarlo_tpu.bias import MetadynamicsBias
    from pmarlo_tpu.bias.harmonic import (
        make_feature_cv_fn,
        make_phi_psi_feature_fn,
    )
    from pmarlo_tpu.features.builtins import phi_psi_indices

    system, pos, _ = alanine_system
    model = _tiny_model()
    phi_q, psi_q, _ = phi_psi_indices(
        topology_info.atom_names, topology_info.residue_ids
    )
    quads = np.concatenate([phi_q, psi_q], 0)
    mtd = MetadynamicsBias(sigma=(0.4, 0.4), height=3.0, max_hills=16)
    hills = mtd.init_state(2)
    for cc in np.linspace(-0.5, 0.5, 5):
        hills = mtd.deposit(hills, jnp.asarray([cc, -cc], jnp.float32))

    feature_fn = make_phi_psi_feature_fn(
        topology_info.atom_names, topology_info.residue_ids
    )
    cv_fn = make_feature_cv_fn(feature_fn, model.as_function())
    bias_fn = mtd.bias_fn(hills, cv_fn)

    b_consts, b_statics, quads2 = PM._bias_consts(model, quads, 1.0)
    consts = {k: jnp.asarray(v) for k, v in b_consts.items()}
    consts.update(b_statics)
    consts["bias_kind"] = "metadynamics"
    consts["bias_S"] = jnp.asarray(
        PM._pack_selectors_for_quads(quads2, system.n_atoms)
    )
    consts["mtd_inv_sigma_list"] = [
        float(v) for v in 1.0 / np.asarray(mtd.sigma, np.float64)
    ]
    consts["mtd_centers_t"] = hills.centers.T
    consts["mtd_heights"] = hills.heights[None, :]
    consts["mtd_mask"] = (
        jnp.arange(mtd.max_hills) < hills.n_hills
    ).astype(jnp.float32)[None, :]

    R = 3
    x = jnp.broadcast_to(pos[None], (R,) + pos.shape) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (R,) + pos.shape
    )
    f0, f1, f2, e = PM._bias_planes(x[..., 0], x[..., 1], x[..., 2], consts)
    f_kernel = np.stack([np.asarray(f0), np.asarray(f1), np.asarray(f2)], -1)
    e_refs = np.asarray([float(bias_fn(xi)) for xi in x])
    f_refs = np.stack([-np.asarray(jax.grad(bias_fn)(xi)) for xi in x])
    scale = max(np.abs(f_refs).max(), 1e-6)
    assert np.abs(np.asarray(e)[:, 0] - e_refs).max() < 1e-3
    assert np.abs(f_kernel - f_refs).max() / scale < 1e-4


def test_fused_metadynamics_on_tpu(alanine_system, topology_info):
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU for Mosaic lowering")
    from pmarlo_tpu.bias import MetadynamicsBias
    from pmarlo_tpu.features.builtins import phi_psi_indices
    from pmarlo_tpu.md.enhanced_sampling import run_fused_metadynamics

    system, pos, _ = alanine_system
    model = _tiny_model()
    phi_q, psi_q, _ = phi_psi_indices(
        topology_info.atom_names, topology_info.residue_ids
    )
    quads = np.concatenate([phi_q, psi_q], 0)
    mtd = MetadynamicsBias(sigma=(0.4, 0.4), height=2.0, max_hills=64,
                           bias_factor=8.0)
    out = run_fused_metadynamics(
        system, pos, cv_model=model, cv_quads=quads, mtd=mtd,
        n_steps=1000, deposit_interval=250, n_replicas=2,
    )
    assert int(out["hills"].n_hills) == 8  # 4 windows x 2 replicas
    assert np.isfinite(np.asarray(out["positions"])).all()
