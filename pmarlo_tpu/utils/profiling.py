"""Profiling and per-stage device-time accounting.

The reference has no tracer (SURVEY.md section 5: pytest-benchmark +
wall-clock history only). Here profiling is first-class: a context manager
around ``jax.profiler`` traces, and a StageTimer that blocks on device
results so stage times mean device time, not dispatch time.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: "str | Path" = "/tmp/pmarlo_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class StageTimer:
    """Wall/device-time accounting per named stage.

    Usage::

        timer = StageTimer()
        with timer.stage("remd"):
            result = remd.run(...)      # timer blocks on device arrays
        print(timer.summary())
    """

    records: List[Dict] = dataclasses.field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, n_items: Optional[int] = None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            # block on any device values the caller stashed in the box
            for value in box.values():
                try:
                    jax.block_until_ready(value)
                except Exception:
                    pass
            wall = time.perf_counter() - t0
            record = {"stage": name, "wall_s": wall}
            if n_items:
                record["throughput_per_s"] = n_items / wall
            self.records.append(record)

    def summary(self) -> List[Dict]:
        return [
            {**r, "wall_s": round(r["wall_s"], 4)} for r in self.records
        ]

    def total(self) -> float:
        return sum(r["wall_s"] for r in self.records)


def device_memory_stats() -> Dict:
    """Best-effort live/peak device memory (bytes) per device."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = None
    return stats


__all__ = ["trace", "StageTimer", "device_memory_stats"]
