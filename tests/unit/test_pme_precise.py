"""Compensated (df32) PME reciprocal path: EFT exactness, weight
accuracy, and the measured force-noise reduction (VERDICT r3 item 2).

The round-3 PME NVE drift floor was attributed to f32 reciprocal force
noise; ROUND4 experiments localized it to the fractional-coordinate
conditioning (t loses log2 K mantissa bits) and the f32 Cox-de Boor
weight recursion (~2 ulp). These tests pin the fix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmarlo_tpu.md import pme
from pmarlo_tpu.md.eft import (
    df_add, df_const, df_mul, two_prod, two_sum,
)


def test_two_sum_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1e4, 1e4, 1000), jnp.float32)
    b = jnp.asarray(rng.uniform(-1e-4, 1e-4, 1000), jnp.float32)
    s, e = two_sum(a, b)
    # verify on host in float64: hi + lo must equal a + b EXACTLY
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(-100, 100, 1000), jnp.float32)
    b = jnp.asarray(rng.uniform(-100, 100, 1000), jnp.float32)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_df_arithmetic_beats_f32():
    """df32 chain accuracy ~1e-12 relative where plain f32 sits ~1e-7."""
    rng = np.random.default_rng(3)
    a = rng.uniform(0.1, 1.0, 512)
    b = rng.uniform(0.1, 1.0, 512)
    x = (jnp.asarray(a, jnp.float32), jnp.zeros(512, jnp.float32))
    y = (jnp.asarray(b, jnp.float32), jnp.zeros(512, jnp.float32))
    ch, cl = df_const(1.0 / 3.0)
    z = df_mul(df_add(x, y), df_mul(y, (jnp.full(512, ch), jnp.full(512, cl))))
    a64 = np.asarray(x[0], np.float64)
    b64 = np.asarray(y[0], np.float64)
    exact = (a64 + b64) * (b64 / 3.0)
    got = np.asarray(z[0], np.float64) + np.asarray(z[1], np.float64)
    rel = np.max(np.abs(got - exact) / np.abs(exact))
    assert rel < 1e-11
    plain = (x[0] + y[0]) * (y[0] * np.float32(1.0 / 3.0))
    rel_plain = np.max(np.abs(np.asarray(plain, np.float64) - exact)
                       / np.abs(exact))
    assert rel_plain > 1e-8  # f32 really is this noisy on the same chain


def _host_bspline_weights(t: np.ndarray, order: int) -> np.ndarray:
    """float64 host oracle of pme._bspline_weights (same layout)."""
    offs = np.arange(order, dtype=np.float64)
    u = t[..., None] + offs
    M = np.maximum(1.0 - np.abs(u - 1.0), 0.0)
    for n in range(3, order + 1):
        M_shift = np.concatenate(
            [np.zeros_like(M[..., :1]), M[..., :-1]], axis=-1
        )
        M = (u * M + (n - u) * M_shift) / (n - 1)
    return np.flip(M, axis=-1)


@pytest.mark.parametrize("order", [4, 6])
def test_df_weights_match_f64_oracle(order):
    rng = np.random.default_rng(4)
    t = rng.uniform(0.0, 1.0, 4096).astype(np.float32)
    th = jnp.asarray(t)
    tl = jnp.zeros_like(th)
    wh, wl = pme._bspline_weights_df(th, tl, order)
    oracle = _host_bspline_weights(t.astype(np.float64), order)
    got = np.asarray(wh, np.float64) + np.asarray(wl, np.float64)
    err_df = np.max(np.abs(got - oracle))
    w32 = pme._bspline_weights(th, order)
    err_f32 = np.max(np.abs(np.asarray(w32, np.float64) - oracle))
    assert err_df < 1e-12
    assert err_f32 > 5e-8  # the plain recursion noise the df path removes
    # partition of unity survives
    np.testing.assert_allclose(np.asarray(wh).sum(-1), 1.0, atol=1e-6)


def test_frac_coords_df_accuracy():
    """t error ~f32 eps absolute vs ~K*eps for the naive path."""
    rng = np.random.default_rng(5)
    L, K = 4.54, 32
    x = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)
    S = np.diag([K / L] * 3)
    u0, th, tl = pme._frac_coords_df(x, S)
    x64 = np.asarray(x, np.float64)
    u64 = x64 * (K / L)
    t64 = u64 - np.floor(u64)
    got = np.asarray(th, np.float64) + np.asarray(tl, np.float64)
    # compare only where the floor agrees (boundary ties)
    mask = np.floor(u64) == np.asarray(u0, np.float64)
    assert mask.mean() > 0.999
    assert np.max(np.abs(got - t64)[mask]) < 5e-7
    t_naive = np.asarray(
        (x * np.float32(K / L)) - jnp.floor(x * np.float32(K / L)),
        np.float64,
    )
    assert np.max(np.abs(t_naive - t64)[mask]) > 5e-7  # naive is worse
    assert np.asarray(th).min() >= 0.0 and np.asarray(th).max() < 1.0


def _lattice_water():
    rng = np.random.default_rng(0)
    ns, spacing = 8, 0.31
    o = np.stack(np.meshgrid(*[np.arange(ns) * spacing + 0.1] * 3,
                             indexing="ij"), -1).reshape(-1, 3)
    h1 = o + np.array([0.09572, 0, 0])
    h2 = o + np.array([-0.0239, 0.0927, 0])
    x = np.stack([o, h1, h2], 1).reshape(-1, 3)
    x = x + rng.normal(0, 0.01, x.shape)
    L = ns * spacing + 0.2
    q = np.tile([-0.834, 0.417, 0.417], o.shape[0])
    return x, q, (L, L, L)


def test_precise_reciprocal_cuts_force_noise():
    """Force error vs the f64 oracle drops >= 2x with precise=True
    (measured 2.9x on the larger attribution config)."""
    from pmarlo_tpu.constants import COULOMB_CONSTANT_KJ_NM_PER_MOL_E2 as KE

    x, q, box = _lattice_water()
    alpha = pme.ewald_alpha(0.9, 5e-4)
    order = 6
    shape = pme.pme_grid_shape(box, pme.pme_spacing(order, alpha))
    x32 = jnp.asarray(x, jnp.float32)
    q32 = jnp.asarray(q, jnp.float32)

    g_fast = jax.grad(lambda v: pme.reciprocal_energy(
        v, q32, box, alpha, shape, order))(x32)
    g_prec = jax.grad(lambda v: pme.reciprocal_energy(
        v, q32, box, alpha, shape, order, precise=True))(x32)

    with jax.enable_x64():
        K1, K2, K3 = shape
        B = (pme._bspline_bsq(K1, order)[:, None, None]
             * pme._bspline_bsq(K2, order)[None, :, None]
             * pme._bspline_bsq(K3, order)[None, None, :])
        fr = lambda K: np.fft.fftfreq(K) * K
        msq = ((fr(K1)[:, None, None] / box[0]) ** 2
               + (fr(K2)[None, :, None] / box[1]) ** 2
               + (fr(K3)[None, None, :] / box[2]) ** 2)
        with np.errstate(divide="ignore", invalid="ignore"):
            infl = np.exp(-np.pi ** 2 * msq / alpha ** 2) / msq * B
        infl[0, 0, 0] = 0.0
        V = box[0] * box[1] * box[2]

        def E64(xx):
            Q = pme.spread_charges(
                xx.astype(jnp.float64), q32.astype(jnp.float64),
                box, shape, order)
            F = jnp.fft.fftn(Q)
            return (KE / (2.0 * np.pi * V)) * jnp.sum(
                jnp.asarray(infl) * jnp.abs(F) ** 2)

        gT = np.asarray(jax.grad(E64)(x32.astype(jnp.float64)))

    err = lambda g: float(np.sqrt(np.mean(
        np.sum((np.asarray(g, np.float64) - gT) ** 2, -1))))
    e_fast, e_prec = err(g_fast), err(g_prec)
    assert e_prec < e_fast / 2.0, (e_fast, e_prec)
    # energies agree between the paths (same physics)
    ef = float(pme.reciprocal_energy(x32, q32, box, alpha, shape, order))
    ep = float(pme.reciprocal_energy(x32, q32, box, alpha, shape, order,
                                     precise=True))
    assert abs(ef - ep) < 1e-3 * abs(ef) + 1e-2


def test_precise_traced_box_matches_static():
    """The NPT path (traced box) must reproduce the static-box precise
    reciprocal energy AND gradient when evaluated at the same box
    (round-5 extension: the md/pme.py static-only guards are gone)."""
    x, q, box = _lattice_water()
    alpha = pme.ewald_alpha(0.9, 5e-4)
    shape = pme.pme_grid_shape(box, pme.pme_spacing(6, alpha))
    x32 = jnp.asarray(x, jnp.float32)
    q32 = jnp.asarray(q, jnp.float32)

    e_static, g_static = jax.value_and_grad(lambda v: pme.reciprocal_energy(
        v, q32, box, alpha, shape, 6, precise=True))(x32)

    @jax.jit
    def traced(v, b):
        return pme.reciprocal_energy(v, q32, b, alpha, shape, 6,
                                     precise=True)

    e_traced, g_traced = jax.value_and_grad(traced)(
        x32, jnp.asarray(box, jnp.float32))
    assert abs(float(e_static) - float(e_traced)) < 1e-3 * abs(
        float(e_static)) + 1e-2
    np.testing.assert_allclose(np.asarray(g_traced), np.asarray(g_static),
                               atol=2e-3, rtol=1e-3)


def test_s_df_traced_split_accuracy():
    """The on-device df split of S = Hinv diag(K) must match the host
    float64 value to ~1e-12 relative (orthorhombic and triclinic)."""
    # the runtime box IS f32 (the NPT barostat state); the df split's
    # job is 1/fl32(L) to ~2^-45 relative, so the oracle uses the
    # f32-rounded box values
    box64 = np.float64(np.float32([4.54321, 3.98765, 5.12345]))
    ratios = (0.0, 0.0, 0.0)
    shape = (32, 40, 48)
    Sh, Sl = pme._S_df_traced(jnp.asarray(box64, jnp.float32), ratios, shape)
    S64 = np.diag(np.asarray(shape, np.float64) / box64)
    got = np.asarray(Sh, np.float64) + np.asarray(Sl, np.float64)
    np.testing.assert_allclose(got, S64, rtol=1e-11, atol=1e-13)
    # triclinic ratios: compare against the host inverse of H
    from pmarlo_tpu.md.box import box_matrix

    ratios = (0.2, 0.1, 0.15)
    tilt = (ratios[0] * box64[0], ratios[1] * box64[0],
            ratios[2] * box64[1])
    H = np.asarray(box_matrix(tuple(box64), tilt), np.float64)
    S_ref = np.linalg.inv(H) @ np.diag(np.asarray(shape, np.float64))
    Sh, Sl = pme._S_df_traced(jnp.asarray(box64, jnp.float32), ratios, shape)
    got = np.asarray(Sh, np.float64) + np.asarray(Sl, np.float64)
    np.testing.assert_allclose(got, S_ref, atol=1e-8, rtol=1e-8)


@pytest.mark.slow
def test_run_segment_pme_precise_smoke(tmp_path):
    """pme_precise threads end to end; NVE stays finite and the
    first-frame energies of fast and precise paths agree."""
    import pmarlo_tpu
    from pmarlo_tpu.io.pdb import write_pdb
    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure

    x, q, box = _lattice_water()
    n_wat = len(x) // 3
    names = ["O", "H1", "H2"]
    residues = []
    for i in range(n_wat):
        atoms = [PDBAtom(name=names[k], resname="HOH", resid=i + 1,
                         chain="A", xyz=tuple(x[3 * i + k]),
                         element=names[k][0])
                 for k in range(3)]
        residues.append(PDBResidue(name="HOH", resid=i + 1, chain="A",
                                   atoms=atoms))
    s = PDBStructure(residues=residues, box=box)
    pdb = str(tmp_path / "wat.pdb")
    atoms = [a for r in s.residues for a in r.atoms]
    write_pdb(pdb, np.asarray([a.xyz for a in atoms]),
              [a.name for a in atoms], [a.resname for a in atoms],
              [a.resid for a in atoms], box=box)
    res = pmarlo_tpu.run_segment(
        pdb, n_steps=20, report_interval=10, ensemble="nve",
        nonbonded="pme", pme_precise=True, minimize_iterations=20,
        seed=1,
    )
    assert np.isfinite(np.asarray(res["total_energy"])).all()
    # NPT + pme_precise: supported since round 5 (the traced-box df
    # split) — the production explicit protocol gets the precise path
    res_npt = pmarlo_tpu.run_segment(
        pdb, n_steps=50, report_interval=25, ensemble="npt",
        nonbonded="pme", pme_precise=True, minimize_iterations=20,
        seed=1,
    )
    assert np.isfinite(np.asarray(res_npt["positions"])).all()
    assert np.isfinite(np.asarray(res_npt["density_g_cm3"])).all()
