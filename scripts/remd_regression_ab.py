"""Attribute the alanine-REMD throughput regression (VERDICT r4 item 2).

r3 -> r5 headline: ns_per_day_per_replica 13,034 -> ~9,000 with NO commits
touching the fused chunk kernel or the run() scan structure since r3
(verified: only ba8985c/f0863f9 touched md/pallas_md.py + remd/remd.py,
neither on the alanine path). This decomposes one bench-identical run into

  device   - the jitted 200-attempt block called on device values,
             block_until_ready on the outputs, no host transfer
  transfer - np.asarray of the block outputs (frames ride the axon tunnel)
  dispatch - full run() wall minus the two above

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/remd_regression_ab.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pmarlo_tpu.data import alanine_dipeptide_structure
from pmarlo_tpu.md.forcefield import build_system
from pmarlo_tpu.remd.remd import RemdConfig, ReplicaExchange

N_STEPS = 20_000
EXCHANGE_FREQUENCY = 100
N_ATTEMPTS = N_STEPS // EXCHANGE_FREQUENCY

system, positions = build_system(alanine_dipeptide_structure(), gb_model="gbn2")
cfg = RemdConfig(
    n_replicas=32, t_min=300.0, t_max=450.0,
    exchange_frequency=EXCHANGE_FREQUENCY, report_interval=EXCHANGE_FREQUENCY,
    dt_ps=0.002, seed=0, attempts_per_block=N_ATTEMPTS,
)
remd = ReplicaExchange(system, positions, cfg, use_pallas=True)
remd.run(n_steps=N_STEPS)  # warm-up compile (bench-identical)

out = {"backend": jax.default_backend()}

# full run() wall, 5 repeats (the bench row)
walls = []
for _ in range(5):
    t0 = time.perf_counter()
    remd.run(n_steps=N_STEPS)
    walls.append(time.perf_counter() - t0)
out["run_wall_s_median"] = float(np.median(walls))
out["run_wall_s_all"] = [round(w, 4) for w in walls]

# device-only: call the cached 200-attempt block executable directly
blk = remd._jit_cache[("run", N_ATTEMPTS, 1)]
st, ids, key = remd.state, remd.replica_ids, remd._swap_key
(st2, ids2, key2), dev_out = blk(st, ids, key, jnp.asarray(0, jnp.int32))
jax.block_until_ready(dev_out)
devs = []
for _ in range(5):
    t0 = time.perf_counter()
    (st2, ids2, key2), dev_out = blk(st, ids, key, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(dev_out)
    devs.append(time.perf_counter() - t0)
out["device_block_s_median"] = float(np.median(devs))
out["device_block_s_all"] = [round(w, 4) for w in devs]

# host transfer of the block outputs (frames + ids + acceptance)
trs = []
for _ in range(5):
    (st2, ids2, key2), dev_out = blk(st, ids, key, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(dev_out)
    t0 = time.perf_counter()
    host = jax.tree_util.tree_map(np.asarray, dev_out)
    trs.append(time.perf_counter() - t0)
nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(host))
out["transfer_s_median"] = float(np.median(trs))
out["transfer_mb"] = nbytes / 1e6
out["transfer_mb_s"] = nbytes / 1e6 / float(np.median(trs))

out["residual_dispatch_s"] = (
    out["run_wall_s_median"] - out["device_block_s_median"]
    - out["transfer_s_median"]
)
per_replica = N_STEPS * 0.002 * 1e-3 * 86_400.0
out["ns_day_per_replica_full"] = per_replica / out["run_wall_s_median"]
out["ns_day_per_replica_device_only"] = per_replica / out["device_block_s_median"]
print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in out.items()}, indent=1))
