"""Temperature replica exchange: vmapped replicas, on-device swaps, demux."""

from .remd import (
    RemdConfig,
    RemdResult,
    ReplicaExchange,
    run_replica_exchange,
)

from .ladder import suggest_temperature_ladder

__all__ = ["RemdConfig", "RemdResult", "ReplicaExchange",
           "run_replica_exchange", "suggest_temperature_ladder"]
