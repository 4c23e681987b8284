"""On-chip A/B for the 26.8k culled-GB config (VERDICT r4 item 7).

Measures the plane-packed Newton block-list kernels against the round-4
anchor (119.14 ms dense, 43.3/35.8 ms culled), and the windowed one-hot
bonded kernel against the XLA gather glue — standalone force evals plus
the in-scan MD-step rate that PROFILE.md treats as ground truth.

Run:  python - < scripts/gb_culled_ab.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, *args, n=10):
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

    from pmarlo_tpu.data import replicate_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.integrate import run_md, thermalize
    from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
    from pmarlo_tpu.protein.protein import Protein

    rows = {"backend": jax.default_backend()}
    p = Protein("/root/reference/tests/_assets/3gd8.pdb", ph=7.0).prepare()

    big = replicate_structure(p.structure, n=(2, 2, 2), gap=0.6)
    gsys, gx0 = build_system(big, gb_model="gbn2")
    gx = jnp.asarray(np.asarray(gx0), jnp.float32)
    rows["n_atoms"] = gsys.n_atoms

    variants = {
        "newton_gather": dict(bonded="gather"),
        "newton_window": dict(bonded="window"),
    }
    fns = {}
    for name, kw in variants.items():
        fn = build_pair_force_fn(gsys, tile=128, gb_cutoff=1.5,
                                 order_from=np.asarray(gx0), **kw)
        fns[name] = fn
        rows[f"gb27k_force_ms_{name}"] = _timeit(fn, gx, n=10)
        print(name, rows[f"gb27k_force_ms_{name}"], flush=True)

    # physics cross-check on chip
    e_g, f_g = fns["newton_gather"](gx)
    e_w, f_w = fns["newton_window"](gx)
    rows["gb27k_dE_window_vs_gather"] = float(abs(e_w - e_g))
    rows["gb27k_maxdF_window_vs_gather"] = float(
        jnp.max(jnp.abs(f_w - f_g)))
    print("dE", rows["gb27k_dE_window_vs_gather"],
          "maxdF", rows["gb27k_maxdF_window_vs_gather"], flush=True)

    # in-scan MD step (the PROFILE ground truth): 100-step run_md on a
    # MINIMIZED assembly (raw replicate clashes explode the dynamics and
    # trip the tile-list overflow guard, by design)
    from pmarlo_tpu.md.minimize import minimize_energy

    xmin, _ = minimize_energy(gsys, gx, force_fn=fns["newton_gather"],
                              max_iterations=300)
    for name in ("newton_gather", "newton_window"):
        st = thermalize(gsys, xmin, jax.random.PRNGKey(0), 300.0)
        step100 = lambda s, fn=fns[name]: run_md(
            gsys, s, n_steps=100, dt=0.002, friction=1.0,
            temperature_K=300.0, report_interval=100, force_fn=fn)[0]
        rows[f"gb27k_step_ms_{name}"] = _timeit(step100, st, n=3) / 100.0
        print(name, "step", rows[f"gb27k_step_ms_{name}"], flush=True)

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in rows.items()}, indent=1))


if __name__ == "__main__":
    main()
