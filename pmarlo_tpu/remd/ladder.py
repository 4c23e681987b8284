"""Acceptance-targeted temperature-ladder design for REMD.

The round-2 framework parsed explicit ladders (utils/input_parsing.py,
reference parity) but nothing computed a GOOD ladder: 4 rungs over 60 K
on a 3,350-atom protein accept ~0 swaps (ROUND2_NOTES). This module adds
the standard energy-fluctuation ladder builder (VERDICT r2 next-round
item #7; the tuning knowledge the reference recorded as CHANGELOG-level
benchmarks, CHANGELOG.md:614):

1. probe: short vmapped MD runs at a few temperatures spanning
   [t_min, t_max]; measure mean and std of the potential energy over the
   second half of each probe (first half discarded as equilibration);
2. model: piecewise-linear interpolation of E(T) and sigma_E(T);
3. walk: starting at t_min, pick each next rung so the PREDICTED swap
   acceptance equals the target, using the Gaussian two-rung formula

     P = Phi(mu/s) + exp(mu + s^2/2) * Phi(-mu/s - s),
     mu = (b1 - b2)(E1bar - E2bar),  s = |b1 - b2| sqrt(s1^2 + s2^2)

   (exact for Gaussian energy distributions — the classic Kofke/
   Rathore result), bisected to the requested acceptance.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOLTZMANN_CONSTANT_KJ_PER_MOL as KB


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def predicted_acceptance(
    T1: float, T2: float,
    e_mean: Callable[[float], float],
    e_std: Callable[[float], float],
) -> float:
    """Gaussian-model swap acceptance between rungs at T1 < T2."""
    b1, b2 = 1.0 / (KB * T1), 1.0 / (KB * T2)
    mu = (b1 - b2) * (e_mean(T1) - e_mean(T2))     # <= 0 (E rises with T)
    s = abs(b1 - b2) * math.sqrt(e_std(T1) ** 2 + e_std(T2) ** 2)
    if s < 1e-12:
        return 1.0
    # E[min(1, e^X)] for X ~ N(mu, s^2)
    return _phi(mu / s) + math.exp(min(mu + 0.5 * s * s, 50.0)) * _phi(
        -mu / s - s
    )


@dataclasses.dataclass
class LadderProbe:
    """Measured E(T) statistics from the short probe runs.

    ``e_std`` is the AUTOCORRELATION-CORRECTED fluctuation magnitude:
    the sample std of a window W of correlated samples underestimates
    the true sigma_E by a factor ~sqrt(1 - 2 tau_int / W) (the window
    mean tracks the slow component), which was the round-4 bias that
    forced the design-to-0.45-measure-0.34 acceptance fudge."""

    temperatures: np.ndarray   # (P,)
    e_mean: np.ndarray         # (P,)
    e_std: np.ndarray          # (P,) ESS-corrected sigma_E
    tau_int: Optional[np.ndarray] = None     # (P,) steps
    ess: Optional[np.ndarray] = None         # (P,) W / (2 tau_int)
    probe_steps_used: int = 0

    def mean_at(self, T: float) -> float:
        return float(np.interp(T, self.temperatures, self.e_mean))

    def std_at(self, T: float) -> float:
        return float(np.interp(T, self.temperatures, self.e_std))


def probe_energy_statistics(
    system,
    positions: jax.Array,
    temperatures: Sequence[float],
    *,
    probe_steps: int = 600,
    dt_ps: float = 0.002,
    friction_per_ps: float = 1.0,
    seed: int = 0,
    force_fn: Optional[Callable] = None,
    constraints=None,
    min_ess: float = 20.0,
    max_extensions: int = 2,
) -> LadderProbe:
    """Short vmapped MD at each probe temperature; energy statistics over
    the second half (first half = equilibration, mirroring the
    reference's staged-minimization probe economy, CHANGELOG.md:230).

    Round-5 statistics (VERDICT r4 item 1 — the ladder model must
    predict MEASURED acceptance, no post-hoc target fudge):

    * the tail is detrended linearly before estimating sigma_E (residual
      relaxation drift otherwise inflates it);
    * tau_int of the detrended energy series (Sokal adaptive windowing,
      analysis/diagnostics.py) corrects the correlated-sample bias:
      sigma^2 = s^2 / (1 - 2 tau_int / W);
    * when any temperature's effective sample size W / (2 tau_int)
      falls below ``min_ess``, or the tail still drifts significantly
      (|slope| * W > 2 s — equilibration incomplete), the probe is
      automatically EXTENDED (steps doubled, up to ``max_extensions``
      times) instead of silently returning under-sampled statistics.
    """
    from ..analysis.diagnostics import integrated_autocorrelation_time
    from ..md.integrate import langevin_step, thermalize

    temps = jnp.asarray(list(temperatures), jnp.float32)
    P = temps.shape[0]
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, P)
    x0 = jnp.broadcast_to(positions[None], (P,) + positions.shape)

    def run_probes(steps: int) -> np.ndarray:
        def run_one(x, k, T):
            st = thermalize(system, x, k, T)

            def body(s, _):
                s2, e = langevin_step(
                    system, s, dt=dt_ps, friction=friction_per_ps,
                    temperature_K=T, force_fn=force_fn,
                    constraints=constraints,
                )
                return s2, e

            _, energies = jax.lax.scan(body, st, None, length=steps)
            return energies

        return np.asarray(jax.jit(jax.vmap(run_one))(x0, keys, temps),
                          np.float64)

    steps = int(probe_steps)
    for _ in range(max_extensions + 1):
        energies = run_probes(steps)
        if not np.isfinite(energies).all():
            raise ValueError(
                "probe runs produced non-finite energies — minimize the "
                "structure before probing (pass minimized positions)"
            )
        tails = energies[:, steps // 2:]
        W = tails.shape[1]
        t_idx = np.arange(W, dtype=np.float64)
        means = np.empty(P)
        sigmas = np.empty(P)
        taus = np.empty(P)
        drifting = False
        for p in range(P):
            y = tails[p]
            slope, intercept = np.polyfit(t_idx, y, 1)
            resid = y - (slope * t_idx + intercept)
            s = float(resid.std())
            tau = integrated_autocorrelation_time(resid)
            means[p] = float(y.mean())
            taus[p] = tau
            # correlated-window bias correction, floored at 2x (past
            # that the estimate is extension territory, not correction)
            corr = max(1.0 - 2.0 * tau / W, 0.25)
            sigmas[p] = s / math.sqrt(corr)
            if abs(slope) * W > 2.0 * max(s, 1e-12):
                drifting = True
        ess = W / (2.0 * taus)
        if not drifting and float(ess.min()) >= min_ess:
            break
        steps *= 2
    return LadderProbe(
        temperatures=np.asarray(temps, np.float64),
        e_mean=means,
        e_std=sigmas,
        tau_int=taus,
        ess=ess,
        probe_steps_used=steps,
    )


def suggest_temperature_ladder(
    system,
    positions: jax.Array,
    *,
    t_min: float = 300.0,
    t_max: float = 360.0,
    target_acceptance: float = 0.3,
    max_rungs: int = 128,
    n_probe: int = 4,
    probe_steps: int = 600,
    dt_ps: float = 0.002,
    friction_per_ps: float = 1.0,
    seed: int = 0,
    force_fn: Optional[Callable] = None,
    constraints=None,
    probe: Optional[LadderProbe] = None,
) -> Tuple[np.ndarray, List[float]]:
    """Build a ladder hitting ``target_acceptance`` between neighbors.

    Returns (ladder (R,), predicted_acceptances (R-1,)). Pass ``probe``
    to reuse measured statistics (e.g. from a previous call). The walk
    is monotone: each rung is found by bisection on the predicted
    acceptance; geometric spacing emerges naturally when sigma_E(T) is
    ~constant in relative terms."""
    if not (0.0 < target_acceptance < 1.0):
        raise ValueError("target_acceptance must be in (0, 1)")
    if t_max <= t_min:
        raise ValueError("t_max must exceed t_min")
    if probe is None:
        # geometric probe temperatures (ladders are ~geometric)
        ratio = (t_max / t_min) ** (1.0 / max(n_probe - 1, 1))
        probe_temps = [t_min * ratio**i for i in range(n_probe)]
        probe = probe_energy_statistics(
            system, positions, probe_temps, probe_steps=probe_steps,
            dt_ps=dt_ps, friction_per_ps=friction_per_ps, seed=seed,
            force_fn=force_fn, constraints=constraints,
        )

    ladder = [float(t_min)]
    predicted: List[float] = []
    while ladder[-1] < t_max and len(ladder) < max_rungs:
        T1 = ladder[-1]

        def acc(T2: float) -> float:
            return predicted_acceptance(T1, T2, probe.mean_at, probe.std_at)

        if acc(t_max) >= target_acceptance:
            ladder.append(float(t_max))
            predicted.append(acc(t_max))
            break
        lo, hi = T1 * (1.0 + 1e-6), float(t_max)
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            if acc(mid) > target_acceptance:
                lo = mid
            else:
                hi = mid
        T2 = 0.5 * (lo + hi)
        ladder.append(T2)
        predicted.append(acc(T2))
    if ladder[-1] < t_max:
        # no silent caps: a truncated ladder installed as the production
        # ladder would never sample near the requested t_max
        raise ValueError(
            f"acceptance-targeted ladder needs more than max_rungs="
            f"{max_rungs} rungs to span [{t_min}, {t_max}] K at target "
            f"acceptance {target_acceptance} (reached {ladder[-1]:.1f} K "
            f"after {len(ladder)} rungs) — raise max_rungs, lower the "
            "target acceptance, or narrow the temperature range"
        )
    return np.asarray(ladder, np.float64), predicted


__all__ = [
    "LadderProbe", "predicted_acceptance", "probe_energy_statistics",
    "suggest_temperature_ladder",
]
