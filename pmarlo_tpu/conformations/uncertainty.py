"""Bootstrap uncertainty for TPT observables
(reference: src/pmarlo/conformations/uncertainty.py:15,31 — trajectory
resampling -> MSM rebuild -> TPT observable CIs; hyperparameter ensembles)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..msm.estimation import build_msm
from ..msm.tpt import reactive_flux
from ..utils.errors import EstimationError
from .results import UncertaintyResult


@dataclasses.dataclass
class UncertaintyQuantifier:
    n_bootstrap: int = 50
    ci_level: float = 0.95
    seed: int = 0

    def bootstrap_tpt(
        self,
        dtrajs: Sequence[np.ndarray],
        lag: int,
        n_states: int,
        source: Sequence[int],
        sink: Sequence[int],
    ) -> UncertaintyResult:
        """Resample trajectories with replacement, rebuild the MSM, rerun
        TPT, and report percentile CIs of rate/MFPT/total flux."""
        rng = np.random.default_rng(self.seed)
        dtrajs = [np.asarray(d) for d in dtrajs]
        observables: Dict[str, List[float]] = {"rate": [], "mfpt": [], "total_flux": []}
        src_set, snk_set = set(map(int, source)), set(map(int, sink))
        for _ in range(self.n_bootstrap):
            idx = rng.integers(0, len(dtrajs), len(dtrajs))
            sample = [dtrajs[i] for i in idx]
            try:
                msm = build_msm(sample, lag, n_states)
                active = set(msm.active_states.tolist())
                if not (src_set <= active and snk_set <= active):
                    continue
                # map endpoint indices into the restricted space
                remap = {s: i for i, s in enumerate(msm.active_states.tolist())}
                A = [remap[s] for s in src_set]
                B = [remap[s] for s in snk_set]
                t = reactive_flux(
                    msm.restricted_T(), A, B,
                    pi=msm.stationary_distribution[msm.active_states],
                    n_pathways=0,
                )
                if np.isfinite(t.rate):
                    observables["rate"].append(t.rate)
                    observables["mfpt"].append(t.mfpt)
                    observables["total_flux"].append(t.total_flux)
            except (EstimationError, np.linalg.LinAlgError):
                continue
        if not observables["rate"]:
            raise EstimationError(
                "no bootstrap sample produced a connected MSM containing the endpoints"
            )
        lo_q = (1 - self.ci_level) / 2
        means, cis = {}, {}
        for key, values in observables.items():
            arr = np.asarray(values)
            means[key] = float(arr.mean())
            cis[key] = (
                float(np.quantile(arr, lo_q)),
                float(np.quantile(arr, 1 - lo_q)),
            )
        return UncertaintyResult(
            observable_means=means,
            observable_cis=cis,
            n_bootstrap=len(observables["rate"]),
            ci_level=self.ci_level,
        )

    def hyperparameter_ensemble(
        self,
        dtrajs: Sequence[np.ndarray],
        lags: Sequence[int],
        n_states: int,
        source: Sequence[int],
        sink: Sequence[int],
    ) -> Dict[int, Dict[str, float]]:
        """TPT observables across a lag ensemble (reference hyperparameter
        ensembles): sensitivity report keyed by lag."""
        out: Dict[int, Dict[str, float]] = {}
        for lag in lags:
            try:
                msm = build_msm(list(dtrajs), lag, n_states)
                remap = {s: i for i, s in enumerate(msm.active_states.tolist())}
                if not all(int(s) in remap for s in list(source) + list(sink)):
                    continue
                t = reactive_flux(
                    msm.restricted_T(),
                    [remap[int(s)] for s in source],
                    [remap[int(s)] for s in sink],
                    pi=msm.stationary_distribution[msm.active_states],
                    n_pathways=0,
                )
                out[int(lag)] = {
                    "rate": t.rate, "mfpt": t.mfpt, "total_flux": t.total_flux,
                }
            except (EstimationError, np.linalg.LinAlgError):
                continue
        return out


__all__ = ["UncertaintyQuantifier"]
