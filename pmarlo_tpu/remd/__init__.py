"""Temperature replica exchange: vmapped replicas, on-device swaps, demux."""

from .remd import (
    RemdConfig,
    RemdResult,
    ReplicaExchange,
    run_replica_exchange,
)

__all__ = ["RemdConfig", "RemdResult", "ReplicaExchange", "run_replica_exchange"]
