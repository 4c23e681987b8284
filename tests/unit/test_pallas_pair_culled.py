"""Bounding-sphere tile culling on the dense GB pair kernel
(pallas_pair gb_cutoff — VERDICT r3 item #3).

Correctness contract: culling may only SKIP blocks whose cutoff-masked
contribution is provably zero, so
  1. with a cutoff larger than every pair distance, the culled kernel is
     the base kernel (exact same physics, different loop structure);
  2. the Morton-permuted layout changes nothing but summation order;
  3. on two clusters farther apart than the cutoff, energy decomposes
     EXACTLY into the clusters' isolated energies (an independent oracle
     for the cutoff semantics: descreening, LJ, Coulomb and the GB cross
     term must all truncate together, including the index-band add-back
     for chain-boundary pairs with adjacent indices).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmarlo_tpu.data import alanine_dipeptide_structure, replicate_structure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.md.pallas_pair import build_pair_force_fn


@pytest.fixture(scope="module")
def alanine_gbn2():
    system, x0 = build_system(
        alanine_dipeptide_structure(), gb_model="gbn2"
    )
    return system, jnp.asarray(x0, jnp.float32)


@pytest.fixture(scope="module")
def two_clusters():
    """Two alanine copies 8 nm apart (adjacent atom indices across the
    chain boundary — the add-back stress case)."""
    big = replicate_structure(
        alanine_dipeptide_structure(), n=(2, 1, 1), spacing=(8.0, 0.0, 0.0)
    )
    system, x0 = build_system(big, gb_model="gbn2")
    return system, jnp.asarray(x0, jnp.float32)


@pytest.mark.slow
@pytest.mark.parametrize("newton", [False, True])
def test_huge_cutoff_matches_base(alanine_gbn2, newton):
    system, x = alanine_gbn2
    fn0 = build_pair_force_fn(system, tile=128, interpret=True)
    fn1 = build_pair_force_fn(system, tile=128, interpret=True,
                              gb_cutoff=50.0, newton=newton)
    e0, f0 = fn0(x)
    e1, f1 = fn1(x)
    assert abs(float(e1 - e0)) < 1e-3
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-3)


@pytest.mark.parametrize("newton", [False, True])
def test_morton_order_is_layout_only(two_clusters, newton):
    system, x = two_clusters
    fn_id = build_pair_force_fn(system, tile=128, interpret=True,
                                gb_cutoff=2.0, newton=newton)
    fn_mo = build_pair_force_fn(system, tile=128, interpret=True,
                                gb_cutoff=2.0, order_from=np.asarray(x),
                                newton=newton)
    e1, f1 = fn_id(x)
    e2, f2 = fn_mo(x)
    assert abs(float(e2 - e1)) < 1e-3
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=2e-3)


def test_two_cluster_energy_decomposes(alanine_gbn2, two_clusters):
    """E(A ∪ B; cutoff) == E(A) + E(B) when the clusters are beyond the
    cutoff: descreening, LJ, Coulomb, GB cross AND the banded add-back
    (chain-boundary pairs have |i-j| <= D but sit at 8 nm) all truncate
    consistently."""
    system1, x1 = alanine_gbn2
    system2, x2 = two_clusters
    fn1 = build_pair_force_fn(system1, tile=128, interpret=True)
    fn2 = build_pair_force_fn(system2, tile=128, interpret=True,
                              gb_cutoff=2.0, order_from=np.asarray(x2))
    e1, f1 = fn1(x1)
    e2, f2 = fn2(x2)
    assert abs(float(e2) - 2.0 * float(e1)) < 5e-3
    # intra-cluster forces must match the isolated molecule (the second
    # copy only to f32 coordinate granularity at the 8 nm offset, which
    # the raw high-force geometry amplifies — compare the first copy)
    np.testing.assert_allclose(np.asarray(f2)[:22], np.asarray(f1),
                               atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("newton", [False, True])
def test_culled_equals_masked_on_same_system(two_clusters, newton):
    """Culling is a pure skip: the culled kernel must equal the SAME
    cutoff physics evaluated without any profitable culling (identity
    order on a system where both clusters share every tile)."""
    system, x = two_clusters
    # tile 256 puts all 44 atoms in ONE tile: nothing can be culled
    fn_one = build_pair_force_fn(system, tile=256, interpret=True,
                                 gb_cutoff=2.0)
    # tile 128 + Morton order separates the clusters into tiles
    fn_cul = build_pair_force_fn(system, tile=128, interpret=True,
                                 gb_cutoff=2.0, order_from=np.asarray(x),
                                 newton=newton)
    e1, f1 = fn_one(x)
    e2, f2 = fn_cul(x)
    assert abs(float(e2 - e1)) < 1e-2
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=2e-3)


def test_dense_newton_matches_dense(two_clusters):
    """The symmetric block-list kernels with the FULL static upper
    triangle (gb_cutoff=None, newton=True) are the dense NoCutoff
    physics — each unordered pair counted exactly once and scattered
    to both atoms."""
    system, x = two_clusters
    fn0 = build_pair_force_fn(system, tile=128, interpret=True,
                              newton=False)
    fn1 = build_pair_force_fn(system, tile=128, interpret=True,
                              newton=True)
    e0, f0 = fn0(x)
    e1, f1 = fn1(x)
    assert abs(float(e1 - e0)) < 1e-3
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-3)


def test_newton_padding_blocks_do_not_corrupt_rows(spread_line):
    """Regression: list-padding entries repeat the LAST real block's
    ids. If they restarted a row streak (e.g. pointed at block (0, 0)),
    the padded zero-weight work would OVERWRITE that row's already-
    accumulated output. The sparse line has heavy list padding (KT is
    sized 1.25x the build total), so any corruption shows up against
    the ordered-kernel oracle."""
    system, x0 = spread_line
    fn_o = build_pair_force_fn(system, tile=128, interpret=True,
                               gb_cutoff=1.5, order_from=np.asarray(x0),
                               newton=False)
    fn_n = build_pair_force_fn(system, tile=128, interpret=True,
                               gb_cutoff=1.5, order_from=np.asarray(x0),
                               newton=True)
    e0, f0 = fn_o(x0)
    e1, f1 = fn_n(x0)
    assert abs(float(e1 - e0)) < 2e-2
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=5e-3)


def test_order_from_requires_cutoff(alanine_gbn2):
    system, _ = alanine_gbn2
    with pytest.raises(ValueError, match="order_from"):
        build_pair_force_fn(system, interpret=True,
                            order_from=np.zeros((system.n_atoms, 3)))


def test_replicate_structure_counts():
    big = replicate_structure(alanine_dipeptide_structure(), n=(2, 2, 1))
    n_atoms = sum(len(r.atoms) for r in big.residues)
    assert n_atoms == 4 * 22
    chains = {r.chain for r in big.residues}
    assert len(chains) == 4


@pytest.fixture(scope="module")
def spread_line():
    """120 alanine copies on a 6 nm-spaced line: GRID=21 tiles at tile=128
    with sparse build-time tile lists (K < GRID), so a collapse of the
    assembly can overflow the list width."""
    big = replicate_structure(
        alanine_dipeptide_structure(), n=(120, 1, 1), spacing=(6.0, 0.0, 0.0)
    )
    system, x0 = build_system(big, gb_model="gbn2")
    return system, jnp.asarray(x0, jnp.float32)


@pytest.mark.parametrize("newton", [False, True])
def test_overflow_probe_is_host_visible(spread_line, newton):
    """advisor r4: the NaN-poison flag must be checkable from the host so
    long runs can fail loudly instead of writing NaN trajectories."""
    system, x0 = spread_line
    fn = build_pair_force_fn(system, tile=128, interpret=True,
                             gb_cutoff=1.5, order_from=np.asarray(x0),
                             newton=newton)
    assert hasattr(fn, "check_overflow") and hasattr(fn, "tile_list_width")
    grid = -(-system.n_atoms // 128)
    if newton:
        # block-list width KT must be below the full upper triangle,
        # else overflow cannot occur
        assert fn.tile_list_width < grid * (grid + 1) // 2
    else:
        assert fn.tile_list_width < grid  # per-row width K < GRID
    assert not bool(fn.check_overflow(x0))
    # collapse the assembly: every tile AABB lands within the cutoff of
    # every other -> the build-sized list width overflows
    assert bool(fn.check_overflow(x0 * 0.001))


@pytest.mark.slow
def test_run_md_raises_on_tile_list_overflow(spread_line):
    from pmarlo_tpu.md.integrate import run_md, thermalize

    system, x0 = spread_line
    fn = build_pair_force_fn(system, tile=128, interpret=True,
                             gb_cutoff=1.5, order_from=np.asarray(x0))
    state = thermalize(system, x0 * 0.001, jax.random.PRNGKey(0), 300.0)
    with pytest.raises(RuntimeError, match="tile neighbor list overflow"):
        run_md(system, state, n_steps=1, dt=0.001, friction=1.0,
               temperature_K=300.0, report_interval=1, force_fn=fn)
