"""Sampling-quality benchmark metrics
(reference: src/pmarlo/benchmark/__init__.py:18 run_benchmark — 2D
coverage, sign-change transitions, FES)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..msm.free_energy import generate_2d_fes


def coverage_2d(
    cv1: np.ndarray, cv2: np.ndarray, bins: int = 32,
    ranges: Optional[Tuple[Tuple[float, float], Tuple[float, float]]] = None,
) -> float:
    """Fraction of 2D bins visited."""
    if ranges is None:
        ranges = (
            (float(np.min(cv1)), float(np.max(cv1))),
            (float(np.min(cv2)), float(np.max(cv2))),
        )
    H, _, _ = np.histogram2d(cv1, cv2, bins=bins, range=ranges)
    return float((H > 0).mean())


def sign_change_transitions(x: np.ndarray, threshold: float = 0.0) -> int:
    """Number of threshold crossings of a 1D CV — the barrier-recrossing
    count used as a sampling KPI."""
    x = np.asarray(x).ravel()
    sign = np.sign(x - threshold)
    sign = sign[sign != 0]
    return int(np.sum(np.abs(np.diff(sign)) > 0))


def run_benchmark(
    cv1: np.ndarray,
    cv2: np.ndarray,
    *,
    temperature_K: float = 300.0,
    bins: int = 32,
    weights: Optional[np.ndarray] = None,
) -> Dict:
    """(reference benchmark/__init__.py:18): coverage + transitions + FES."""
    fes = generate_2d_fes(
        cv1, cv2, temperature_K=temperature_K, bins=bins, weights=weights
    )
    return {
        "coverage": coverage_2d(np.asarray(cv1), np.asarray(cv2), bins),
        "transitions_cv1": sign_change_transitions(cv1, float(np.median(cv1))),
        "transitions_cv2": sign_change_transitions(cv2, float(np.median(cv2))),
        "fes": fes,
        "finite_fraction": fes.finite_fraction,
        "n_frames": int(np.asarray(cv1).size),
    }


__all__ = ["run_benchmark", "coverage_2d", "sign_change_transitions"]
