"""Roofline pass over the three production configs (VERDICT r4 item 6).

Per-stage wall times measured on the real chip + analytic flop/byte
counts vs the v5e ceilings; results tabulated in PROFILE.md. Stages are
isolated by evaluating the separable pieces (bonded, corrections,
reciprocal, SHAKE) as standalone jitted calls; the Pallas sweeps are
the remainder of the full force eval.

Run:  python - < scripts/roofline.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pmarlo_tpu.io.pdb import PDBAtom, PDBResidue, PDBStructure
    from pmarlo_tpu.md.constraints import (
        build_h_constraints, shake, strip_constrained_bonded,
    )
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.forces import angle_energy, bond_energy, torsion_energy
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from pmarlo_tpu.md.pallas_cells import build_cell_force_fn
    from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
    from pmarlo_tpu.protein.protein import Protein

    rows = {}

    # ---------------- (a) 3,350-atom GBn2 pair-kernel step ----------------
    p = Protein("/root/reference/tests/_assets/3gd8.pdb", ph=7.0).prepare()
    system, x0 = p.create_system()
    fn = build_pair_force_fn(system, tile=256)
    x = jnp.asarray(np.asarray(x0), jnp.float32)

    def bonded(xx):
        return (bond_energy(system, xx) + angle_energy(system, xx)
                + torsion_energy(system, xx))

    bonded_vg = jax.jit(jax.value_and_grad(bonded))
    rows["protein_force_ms"] = _timeit(fn, x)
    rows["protein_bonded_ms"] = _timeit(bonded_vg, x)
    st = thermalize(system, x, jax.random.PRNGKey(0), 300.0)

    def step100(s):
        return run_md(system, s, n_steps=100, dt=0.002, friction=1.0,
                      temperature_K=300.0, report_interval=100,
                      force_fn=fn)[0]

    rows["protein_step_ms"] = _timeit(step100, st, n=3) / 100.0

    # ---------------- (b) 27k-atom cells + PME step ------------------------
    n_side, spacing = 21, 0.31
    residues, rid = [], 1
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                ox, oy, oz = (0.15 + i * spacing, 0.15 + j * spacing,
                              0.15 + k * spacing)
                mk = lambda n_, x_, y_, z_, e_: PDBAtom(
                    name=n_, resname="HOH", resid=rid, chain="W",
                    xyz=(x_, y_, z_), element=e_)
                residues.append(PDBResidue(
                    name="HOH", resid=rid, chain="W",
                    atoms=[mk("O", ox, oy, oz, "O"),
                           mk("H1", ox + 0.09572, oy, oz, "H"),
                           mk("H2", ox - 0.02399, oy + 0.09266, oz, "H")]))
                rid += 1
    L = n_side * spacing + 0.1
    wsys, wx0 = build_system(PDBStructure(residues=residues),
                             box=(L, L, L), cutoff=0.9, hydrogen_mass=None)
    spec = build_h_constraints(wsys)
    mds = strip_constrained_bonded(wsys)
    fn_pme = build_cell_force_fn(mds, electrostatics="pme")
    fn_rf = build_cell_force_fn(mds)
    wx = jnp.asarray(np.asarray(wx0), jnp.float32)

    from pmarlo_tpu.md.pme import (
        ewald_alpha, pme_spacing, pme_grid_shape, reciprocal_energy,
    )

    q = jnp.asarray(mds.charges, jnp.float32)
    box = tuple(float(b) for b in mds.box)
    alpha = ewald_alpha(0.9, 5e-4)
    shape = fn_pme.pme_mesh_shape

    recip_vg = jax.jit(jax.value_and_grad(
        lambda v: reciprocal_energy(v, q, box, alpha, shape, 6)))
    rows["cells_pme_force_ms"] = _timeit(fn_pme, wx)
    rows["cells_rf_force_ms"] = _timeit(fn_rf, wx)
    rows["cells_reciprocal_ms"] = _timeit(recip_vg, wx)

    def shake_once(xx):
        return shake(spec, xx + 1e-4, xx)

    rows["cells_shake_ms"] = _timeit(jax.jit(shake_once), wx)
    wst = thermalize(wsys, wx, jax.random.PRNGKey(1), 300.0)

    def wstep100(s):
        return run_md(wsys, s, n_steps=100, dt=0.002, friction=1.0,
                      temperature_K=300.0, report_interval=100,
                      force_fn=fn_pme, constraints=spec)[0]

    rows["cells_pme_step_ms"] = _timeit(wstep100, wst, n=3) / 100.0

    # binning cost: fresh state vs amortized apply
    if hasattr(fn_pme, "init_state"):
        rows["cells_bin_ms"] = _timeit(fn_pme.init_state, wx)

    # ---------------- (c) 26.8k culled-GB force ----------------------------
    from pmarlo_tpu.data import replicate_structure

    big = replicate_structure(p.structure, n=(2, 2, 2), gap=0.6)
    gsys, gx0 = build_system(big, gb_model="gbn2")
    gx = jnp.asarray(np.asarray(gx0), jnp.float32)
    gfn = build_pair_force_fn(gsys, tile=128, gb_cutoff=1.5,
                              order_from=np.asarray(gx0))

    def gbonded(xx):
        return (bond_energy(gsys, xx) + angle_energy(gsys, xx)
                + torsion_energy(gsys, xx))

    rows["gb27k_force_ms"] = _timeit(gfn, gx, n=5)
    rows["gb27k_bonded_ms"] = _timeit(jax.jit(jax.value_and_grad(gbonded)),
                                      gx, n=5)
    # computed tile fraction from live counts (analytic work model input)
    xg = np.asarray(gx)
    # reproduce the builder's chunk-count computation
    tile = 128
    n_real = gsys.n_atoms
    N = ((n_real + tile - 1) // tile) * tile
    from pmarlo_tpu.md.pallas_pair import _morton_order

    perm = _morton_order(xg)
    xp = xg[perm]
    if N > n_real:
        xp = np.concatenate([xp, np.repeat(xp[-1:], N - n_real, 0)])
    xr = xp.reshape(N // tile, tile, 3)
    lo, hi = xr.min(1), xr.max(1)
    g1 = lo[:, None, :] - hi[None, :, :]
    g2 = lo[None, :, :] - hi[:, None, :]
    gap = np.maximum(0.0, np.maximum(g1, g2))
    close = (gap ** 2).sum(-1) <= 1.5 ** 2
    rows["gb27k_grid"] = int(N // tile)
    rows["gb27k_mean_row_chunks"] = float(close.sum(1).mean())
    rows["gb27k_max_row_chunks"] = int(close.sum(1).max())

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in rows.items()}, indent=1))


if __name__ == "__main__":
    main()
