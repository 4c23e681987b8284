"""Staged repro of the flagship protein-REMD bench TPU-worker crash.

Mirrors bench.bench_protein_remd_production but prints a line after every
phase so the crash point is attributable, and keeps each chip program
small (attempts_per_block=5) so a fault lands close to its cause.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/remd_flagship_stages.py [n_attempts]
"""

import sys
import time

import numpy as np

t_start = time.time()


def log(msg):
    print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

from pmarlo_tpu.md.constraints import build_h_constraints, strip_constrained_bonded
from pmarlo_tpu.md.minimize import minimize_energy
from pmarlo_tpu.md.pallas_pair import build_pair_force_fn
from pmarlo_tpu.protein.protein import Protein
from pmarlo_tpu.remd.ladder import suggest_temperature_ladder
from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

n_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 500

log(f"backend={jax.default_backend()}")
p = Protein("/root/reference/tests/_assets/3gd8.pdb", ph=7.0).prepare()
system, x0 = p.create_system()
log(f"system built: {system.n_atoms} atoms")
fn = build_pair_force_fn(system, tile=256)
xmin, _ = minimize_energy(system, jnp.asarray(x0), force_fn=fn)
jax.block_until_ready(xmin)
log("minimized")

dt = 0.004
hspec = build_h_constraints(system)
fn_md = build_pair_force_fn(strip_constrained_bonded(system), tile=256)
ladder, predicted = suggest_temperature_ladder(
    system, xmin, t_min=300.0, t_max=375.0, target_acceptance=0.30,
    probe_steps=600, n_probe=6, force_fn=fn_md, constraints=hspec,
    max_rungs=48, dt_ps=dt,
)
R = len(ladder)
log(f"ladder designed: {R} rungs {np.round(np.asarray(ladder), 1).tolist()} "
    f"predicted acc {np.round(np.asarray(predicted), 3).tolist()}")

cfg = RemdConfig(
    n_replicas=R, temperatures=tuple(float(t) for t in ladder),
    exchange_frequency=100, report_interval=50, dt_ps=dt, seed=0,
    attempts_per_block=5,
)
remd = ReplicaExchange(system, xmin, cfg, force_fn=fn_md,
                       constraints=hspec, minimize=False)
log("remd constructed; warm-up 500 steps (5 attempts)")
remd.run(n_steps=500)
log("warm-up done; production in 25-attempt slices")
done = 0
while done < n_attempts:
    n = min(25, n_attempts - done)
    res = remd.run(n_steps=n * 100)
    done += n
    acc = res.acceptance_matrix
    fin = acc[np.isfinite(acc)]
    emax = float(np.nanmax(res.potential_energy))
    log(f"attempts {done}/{n_attempts}: mean acc "
        f"{float(fin.mean()) if fin.size else -1:.3f}, max E {emax:.1f}")
log("production complete")
