"""Source/sink auto-detection for TPT
(reference: src/pmarlo/conformations/state_detection.py:13,81 — FES minima
-> timescale gap -> population cascade; committor thresholds)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..msm.pcca import pcca_assignments
from ..utils.errors import EstimationError
from ..utils.msm_utils import stationary_distribution


@dataclasses.dataclass
class StateDetector:
    """Auto-detect reactant/product state sets on a transition matrix.

    Strategy cascade (reference state_detection.py:81): split by the
    slowest eigenmode's sign structure (timescale-gap criterion); pick the
    highest-population microstate on each side; widen each endpoint set by
    a population fraction.
    """

    population_fraction: float = 0.5   # widen endpoints to this fraction of side mass
    min_states_per_side: int = 1

    def auto_detect(
        self,
        T: np.ndarray,
        pi: Optional[np.ndarray] = None,
        free_energies: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (source_states, sink_states) as index arrays."""
        T = np.asarray(T, dtype=np.float64)
        n = T.shape[0]
        if n < 2:
            raise EstimationError("need >= 2 states for endpoint detection")
        if pi is None:
            pi = stationary_distribution(T)

        # slowest non-stationary mode via pi-symmetrized eigh
        sqrt_pi = np.sqrt(np.maximum(pi, 1e-300))
        T_sym = 0.5 * (
            sqrt_pi[:, None] * T / sqrt_pi[None, :]
            + (sqrt_pi[:, None] * T / sqrt_pi[None, :]).T
        )
        evals, evecs = np.linalg.eigh(T_sym)
        order = np.argsort(evals)[::-1]
        if n < 2 or len(order) < 2:
            raise EstimationError("degenerate spectrum")
        phi2 = evecs[:, order[1]] / sqrt_pi  # slowest dynamical mode

        side_a = np.where(phi2 <= 0)[0]
        side_b = np.where(phi2 > 0)[0]
        if side_a.size == 0 or side_b.size == 0:
            # fall back: split by free energy / population extremes
            order_pop = np.argsort(-pi)
            return order_pop[:1], order_pop[-1:]

        src = self._widen(side_a, pi, phi2)
        snk = self._widen(side_b, pi, phi2)
        return src, snk

    def _widen(self, side: np.ndarray, pi: np.ndarray, phi2: np.ndarray) -> np.ndarray:
        """Take the most extreme-committed, highest-population states up to
        the configured population fraction of the side."""
        side_pi = pi[side]
        target = self.population_fraction * side_pi.sum()
        # order by |phi2| * pi: deep and populated first
        score = np.abs(phi2[side]) * side_pi
        order = side[np.argsort(-score)]
        chosen: List[int] = []
        mass = 0.0
        for s in order:
            chosen.append(int(s))
            mass += pi[s]
            if mass >= target and len(chosen) >= self.min_states_per_side:
                break
        return np.asarray(sorted(chosen), dtype=np.int64)

    def from_macrostates(
        self, T: np.ndarray, n_macrostates: int = 2, pi: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(source, sink, assignments) using the two most-populated
        PCCA+ macrostates as endpoints."""
        if pi is None:
            pi = stationary_distribution(np.asarray(T, dtype=np.float64))
        labels, _ = pcca_assignments(T, n_macrostates, pi)
        source = np.where(labels == 0)[0]
        sink = np.where(labels == 1)[0]
        if source.size == 0 or sink.size == 0:
            raise EstimationError("PCCA produced an empty endpoint macrostate")
        return source, sink, labels


__all__ = ["StateDetector"]
