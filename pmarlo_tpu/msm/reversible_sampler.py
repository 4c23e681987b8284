"""Reversible Bayesian transition-matrix posterior (Gibbs sampler).

Matches the semantics of deeptime's ``BayesianMSM`` reversible sampler used
by the reference (/root/reference/src/pmarlo/markov_state_model/_its.py:289-312):
the posterior p(T | C) ∝ Π_ij T_ij^{C_ij} restricted to detailed-balance
transition matrices, sampled by element-wise Gibbs sweeps over the symmetric
flow matrix X (x_ij = pi_i T_ij), following Trendelkamp-Schroer et al.,
J. Chem. Phys. 143, 174101 (2015).

The non-reversible Dirichlet-row posterior in :mod:`pmarlo_tpu.msm.its` is a
*different* posterior (independent rows, no detailed-balance constraint) —
its CI widths are not comparable to the reference's on the same data. This
module provides the reference-matching one.

TPU-first design (not a port of deeptime's sequential C loop): one Gibbs
sweep is decomposed by round-robin EDGE COLORING of the complete graph
(the circle method). The n(n-1)/2 off-diagonal conditionals split into
(m-1) rounds of m/2 mutually independent edges — each round is one
vectorized Metropolis update — and the n diagonal conditionals are mutually
independent, updated as one vectorized exact Beta draw. Independent chains
``vmap`` on top, so the whole sampler is a single jitted program of
fixed-shape vector ops.

Exact conditionals (flat prior on x > 0):
  diagonal:      s = x_ii/(x_ii+b) ~ Beta(C_ii + 1, C_i - C_ii - 1),
                 b = Σ_{k≠i} x_ik held fixed.
  off-diagonal:  p(x) ∝ x^{C_ij+C_ji} (b_i+x)^{-C_i} (b_j+x)^{-C_j};
                 non-standard — one log-normal random-walk Metropolis step
                 per sweep (same treatment as deeptime/msmtools).
Edges with C_ij + C_ji = 0 are held at x = 0 exactly (deeptime's sparsity
structure). Eigenvalues come from the detailed-balance symmetrization
S = X / sqrt(x_i x_j) (real spectrum, ``eigvalsh``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.errors import EstimationError
from ..utils.msm_utils import ensure_connected_counts


def _round_robin_schedule(n: int) -> Tuple[np.ndarray, int]:
    """Edge coloring of K_n via the circle method.

    Returns ``(pairs, m)``: ``pairs`` has shape (m-1, m//2, 2) where m is n
    rounded up to even; every unordered pair (i, j), i<j<m appears exactly
    once, and within a round all pairs are vertex-disjoint (so their Gibbs
    updates are conditionally independent). Pairs touching the padding
    vertex (index >= n) must be masked by the caller.
    """
    m = n if n % 2 == 0 else n + 1
    rounds = []
    for r in range(m - 1):
        row = [(m - 1, r)]
        for k in range(1, m // 2):
            row.append(((r + k) % (m - 1), (r - k) % (m - 1)))
        rounds.append(row)
    pairs = np.asarray(rounds, dtype=np.int32)  # (m-1, m//2, 2)
    # canonical i<j ordering (irrelevant to correctness, nice for debugging)
    lo = pairs.min(axis=-1)
    hi = pairs.max(axis=-1)
    return np.stack([lo, hi], axis=-1), m


def _init_flow_matrix(C: np.ndarray) -> np.ndarray:
    """Reversible-MLE flow matrix as the chain start (mode of the posterior)."""
    from .estimation import reversible_mle, stationary_distribution

    T = reversible_mle(C)
    pi = stationary_distribution(T)
    X = pi[:, None] * T
    X = 0.5 * (X + X.T)  # exact symmetry
    return X / max(X.sum(), 1e-300)


@partial(jax.jit, static_argnames=("n_rounds", "n_burn", "n_keep", "n_thin"))
def _run_chains(
    X0: jax.Array,              # (m, m) symmetric start (shared by chains)
    C: jax.Array,               # (m, m) counts (padded)
    pairs: jax.Array,           # (n_rounds, m//2, 2)
    edge_valid: jax.Array,      # (n_rounds, m//2) bool
    edge_sigma: jax.Array,      # (n_rounds, m//2) proposal widths
    diag_valid: jax.Array,      # (m,) bool
    keys: jax.Array,            # (n_chains, 2) PRNG keys
    *,
    n_rounds: int,
    n_burn: int,
    n_keep: int,
    n_thin: int,
) -> jax.Array:
    """All chains' kept samples, shape (n_chains, n_keep, m, m) flow matrices."""
    m = X0.shape[0]
    Ci = jnp.sum(C, axis=1)                      # row counts (m,)
    Cd = jnp.diagonal(C)
    Csym = C + C.T
    idx = jnp.arange(m)

    def sweep(carry, key):
        X, xrow = carry
        k_diag, k_edge = jax.random.split(key)

        # --- all-diagonal exact Beta step (mutually independent) ---
        b = jnp.maximum(xrow - jnp.diagonal(X), 1e-300)
        a1 = Cd + 1.0
        a2 = jnp.maximum(Ci - Cd - 1.0, 1e-2)
        s = jnp.clip(jax.random.beta(k_diag, a1, a2), 1e-12, 1.0 - 1e-7)
        new_d = jnp.where(diag_valid, b * s / (1.0 - s), jnp.diagonal(X))
        X = X.at[idx, idx].set(new_d)
        xrow = jnp.where(diag_valid, b + new_d, xrow)

        # --- edge rounds: vertex-disjoint Metropolis updates ---
        def round_step(carry, inp):
            X, xrow = carry
            pr, valid, sig, kr = inp
            i, j = pr[:, 0], pr[:, 1]
            x = X[i, j]
            x_safe = jnp.where(valid, x, 1.0)
            bi = jnp.maximum(xrow[i] - x, 1e-300)
            bj = jnp.maximum(xrow[j] - x, 1e-300)
            cs = Csym[i, j]
            ci, cj = Ci[i], Ci[j]
            kz, ku = jax.random.split(kr)
            z = jax.random.normal(kz, x.shape)
            xp = x_safe * jnp.exp(sig * z)

            def logpost(xx):
                return (
                    cs * jnp.log(xx)
                    - ci * jnp.log(bi + xx)
                    - cj * jnp.log(bj + xx)
                )

            # + log-Jacobian of the log-scale random walk
            loga = (logpost(xp) - logpost(x_safe)
                    + jnp.log(xp) - jnp.log(x_safe))
            u = jax.random.uniform(ku, x.shape)
            accept = valid & (jnp.log(u) < loga)
            xn = jnp.where(accept, xp, x)
            X = X.at[i, j].set(xn).at[j, i].set(xn)
            delta = xn - x
            xrow = xrow.at[i].add(delta).at[j].add(delta)
            return (X, xrow), None

        round_keys = jax.random.split(k_edge, n_rounds)
        (X, xrow), _ = jax.lax.scan(
            round_step, (X, xrow), (pairs, edge_valid, edge_sigma, round_keys)
        )
        # renormalize (posterior is scale-invariant; keeps numerics bounded)
        total = jnp.maximum(jnp.sum(xrow), 1e-300)
        return (X / total, xrow / total), None

    def chain(key):
        xrow0 = jnp.sum(X0, axis=1)
        burn_keys = jax.random.split(jax.random.fold_in(key, 0), n_burn)
        carry, _ = jax.lax.scan(sweep, (X0, xrow0), burn_keys)

        def keep_step(carry, k_):
            thin_keys = jax.random.split(k_, n_thin)
            carry, _ = jax.lax.scan(sweep, carry, thin_keys)
            return carry, carry[0]

        keep_keys = jax.random.split(jax.random.fold_in(key, 1), n_keep)
        _, Xs = jax.lax.scan(keep_step, carry, keep_keys)
        return Xs

    return jax.vmap(chain)(keys)


def sample_reversible_posterior(
    counts: np.ndarray,
    n_samples: int = 100,
    *,
    prior: float = 0.0,
    n_burn: int = 50,
    n_thin: int = 2,
    n_chains: int = 8,
    seed: int = 0,
    key: Optional[jax.Array] = None,
    return_flow: bool = False,
) -> np.ndarray:
    """Sample reversible transition matrices from p(T | C).

    Returns (n_samples, n, n) stochastic matrices satisfying detailed
    balance (each sample's stationary flow matrix is exactly symmetric).
    ``counts`` must be connected (use ``ensure_connected_counts`` first);
    ``prior`` adds a pseudocount to every observed (C+C.T > 0) element.
    """
    C = np.asarray(counts, dtype=np.float64)
    n = C.shape[0]
    if n < 2:
        raise EstimationError("reversible sampler needs >= 2 states")
    if prior:
        C = C + prior * ((C + C.T) > 0)
    X0 = _init_flow_matrix(C)

    pairs_np, m = _round_robin_schedule(n)
    if m > n:  # pad with an inert vertex
        Cp = np.zeros((m, m))
        Cp[:n, :n] = C
        Xp = np.zeros((m, m))
        Xp[:n, :n] = X0
        C, X0 = Cp, Xp
    csym = C + C.T
    i, j = pairs_np[..., 0], pairs_np[..., 1]
    edge_valid = (j < n) & (csym[i, j] > 0)
    # proposal width ~ posterior std of log x (1/sqrt of the information)
    edge_sigma = 2.4 / np.sqrt(1.0 + csym[i, j])
    diag_valid = np.arange(m) < n

    n_keep = -(-n_samples // n_chains)  # ceil
    if key is None:
        key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, n_chains)

    Xs = _run_chains(
        jnp.asarray(X0), jnp.asarray(C), jnp.asarray(pairs_np),
        jnp.asarray(edge_valid), jnp.asarray(edge_sigma),
        jnp.asarray(diag_valid), keys,
        n_rounds=int(pairs_np.shape[0]), n_burn=n_burn,
        n_keep=n_keep, n_thin=n_thin,
    )
    X = np.asarray(Xs, dtype=np.float64).reshape(-1, m, m)[:n_samples, :n, :n]
    if return_flow:
        return X
    xrow = X.sum(axis=2, keepdims=True)
    return X / np.maximum(xrow, 1e-300)


def sample_reversible_timescales(
    counts: np.ndarray,
    lag: int,
    *,
    n_samples: int = 100,
    n_timescales: int = 5,
    dt: float = 1.0,
    prior: float = 0.0,
    key: Optional[jax.Array] = None,
    seed: int = 0,
) -> np.ndarray:
    """(n_samples, k) implied timescales from the reversible posterior.

    Drop-in for :func:`pmarlo_tpu.msm.its.sample_posterior_timescales` with
    reference-matching (reversible) posterior semantics. Eigenvalues use the
    detailed-balance symmetrization S_ij = x_ij / sqrt(x_i x_j) — real
    spectrum by construction, solved with batched ``eigvalsh``.
    """
    from .its import _timescales_from_eigvals

    C, _active = ensure_connected_counts(np.asarray(counts), alpha=0.0)
    n = C.shape[0]
    if n < 2:
        return np.full((n_samples, n_timescales), np.nan)
    X = sample_reversible_posterior(
        C, n_samples, prior=prior, key=key, seed=seed, return_flow=True
    )
    xrow = X.sum(axis=2)
    denom = np.sqrt(np.maximum(xrow[:, :, None] * xrow[:, None, :], 1e-300))
    S = X / denom
    evals = np.linalg.eigvalsh(S)
    return _timescales_from_eigvals(evals, lag, dt, n_timescales)


__all__ = [
    "sample_reversible_posterior",
    "sample_reversible_timescales",
]
