"""REMD checkpoint/resume: replica states + PRNG streams + hills serialize.

SURVEY.md section 5 (checkpoint/resume): "shard = checkpoint; replica
states + PRNG keys + bias hills must serialize." A checkpoint is one npz
with every dynamic array of the sampler; ``save_checkpoint`` /
``load_checkpoint`` round-trip a running ReplicaExchange exactly (bitwise
state, deterministic continuation).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..bias.metadynamics import MetaDState
from ..md.integrate import MDState
from .remd import RemdConfig, ReplicaExchange

_FORMAT = "pmarlo_tpu.remd_checkpoint.v1"


def save_checkpoint(
    remd: ReplicaExchange,
    path: "str | Path",
    *,
    hills: Optional[MetaDState] = None,
    extra: Optional[dict] = None,
) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {
        "positions": np.asarray(remd.state.positions),
        "velocities": np.asarray(remd.state.velocities),
        "keys": np.asarray(remd.state.key),
        "step": np.asarray(remd.state.step),
        "replica_ids": np.asarray(remd.replica_ids),
        "swap_key": np.asarray(remd._swap_key),
        "ladder": np.asarray(remd.ladder),
    }
    if hills is not None:
        arrays["hills_centers"] = np.asarray(hills.centers)
        arrays["hills_heights"] = np.asarray(hills.heights)
        arrays["hills_n"] = np.asarray(hills.n_hills)
    meta = {
        "format": _FORMAT,
        "config": {
            "temperatures": list(map(float, remd.config.ladder())),
            "exchange_frequency": remd.config.exchange_frequency,
            "dt_ps": remd.config.dt_ps,
            "friction_per_ps": remd.config.friction_per_ps,
            "report_interval": remd.config.report_interval,
            "seed": remd.config.seed,
        },
        # which physics the run was using — resume must reproduce it, so
        # load_checkpoint validates the caller re-supplies the same modes
        # (a checkpointed constrained cell-kernel run silently resumed on
        # the default unconstrained XLA path would blow up at 2 fs)
        "modes": {
            "has_force_fn_override": remd._force_fn_is_override,
            "has_constraints": remd._constraints is not None,
            "has_bias_fn": remd.bias_fn is not None,
            "use_pallas": bool(remd.use_pallas),
            "has_pallas_bias": remd._pallas_bias is not None,
        },
        "extra": extra or {},
    }
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, metadata=json.dumps(meta), **arrays)
    tmp.replace(path)
    return path


def load_checkpoint(
    path: "str | Path",
    system,
    *,
    bias_fn=None,
    mesh=None,
    force_fn=None,
    constraints=None,
    use_pallas: bool = False,
    pallas_bias=None,
) -> Tuple[ReplicaExchange, Optional[MetaDState], dict]:
    """Reconstruct a ReplicaExchange (and hills ledger) from a checkpoint.

    The checkpoint records which physics modes the run used (force_fn
    override, constraints, bias, pallas). The caller must re-supply the
    SAME modes — a constrained cell-kernel run silently resumed on the
    default unconstrained path would be a different (and explosive)
    simulation, so a mode mismatch raises."""
    path = Path(path)
    with np.load(path) as data:
        meta = json.loads(str(data["metadata"]))
        if meta.get("format") != _FORMAT:
            raise ValueError(f"{path} is not a REMD checkpoint ({meta.get('format')})")
        modes = meta.get("modes", {})
        supplied = {
            "has_force_fn_override": force_fn is not None,
            "has_constraints": constraints is not None,
            "has_bias_fn": bias_fn is not None,
            "use_pallas": bool(use_pallas),
            "has_pallas_bias": pallas_bias is not None,
        }
        mismatched = {
            k: (modes[k], supplied[k])
            for k in supplied
            if k in modes and bool(modes[k]) != supplied[k]
        }
        if mismatched:
            raise ValueError(
                f"checkpoint {path.name} was written with different physics "
                f"modes than supplied (saved vs supplied): {mismatched} — "
                "pass the same force_fn/constraints/bias/pallas options the "
                "original run used"
            )
        cfg_d = meta["config"]
        config = RemdConfig(
            temperatures=tuple(cfg_d["temperatures"]),
            exchange_frequency=int(cfg_d["exchange_frequency"]),
            dt_ps=float(cfg_d["dt_ps"]),
            friction_per_ps=float(cfg_d["friction_per_ps"]),
            report_interval=int(cfg_d["report_interval"]),
            seed=int(cfg_d["seed"]),
        )
        positions = np.asarray(data["positions"])
        remd = ReplicaExchange(
            system, jnp.asarray(positions[0]), config,
            bias_fn=bias_fn, minimize=False, mesh=mesh,
            force_fn=force_fn, constraints=constraints,
            use_pallas=use_pallas, pallas_bias=pallas_bias,
        )
        remd.state = MDState(
            positions=jnp.asarray(positions),
            velocities=jnp.asarray(data["velocities"]),
            key=jnp.asarray(data["keys"]),
            step=jnp.asarray(data["step"]),
        )
        remd.replica_ids = jnp.asarray(data["replica_ids"])
        remd._swap_key = jnp.asarray(data["swap_key"])
        hills = None
        if "hills_centers" in data:
            hills = MetaDState(
                centers=jnp.asarray(data["hills_centers"]),
                heights=jnp.asarray(data["hills_heights"]),
                n_hills=jnp.asarray(data["hills_n"]),
            )
        return remd, hills, meta.get("extra", {})


__all__ = ["save_checkpoint", "load_checkpoint"]
