"""VAMP-2 objective with stabilized covariance inverses.

Rebuild of the reference VAMP2Loss (src/pmarlo/features/deeptica/
losses.py:13-188): weighted covariances, trace-scaled ridge +
alpha-shrinkage, symmetric cleanup, adaptive-jitter Cholesky with retries,
score = ||K||_F^2 via triangular solves, condition-number metrics.

TPU numerics: the reference runs these in float64 torch. Here everything
stays float32 (the TPU-native dtype); stability comes from the trace-scaled
ridge, alpha-shrinkage, and the jitter ladder instead of extra precision —
the SURVEY section 7 recipe. The adaptive jitter is a fixed 4-attempt
ladder of where-selects (compile-friendly; the reference retries in
Python).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _covariances(
    z0: jax.Array,
    zt: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Mean-centered (C00, C0t, Ctt) with optional pair weights."""
    if weights is None:
        w = jnp.ones(z0.shape[0], dtype=z0.dtype)
    else:
        w = weights.astype(z0.dtype)
    wsum = jnp.sum(w) + 1e-12
    wn = (w / wsum)[:, None]
    m0 = jnp.sum(wn * z0, axis=0)
    mt = jnp.sum(wn * zt, axis=0)
    a = z0 - m0
    b = zt - mt
    C00 = (a * wn).T @ a
    C0t = (a * wn).T @ b
    Ctt = (b * wn).T @ b
    return C00, C0t, Ctt


def _regularize(C: jax.Array, ridge: float, alpha: float) -> jax.Array:
    """Trace-scaled ridge + alpha-shrinkage toward scaled identity,
    symmetric cleanup (reference losses.py:54-96)."""
    k = C.shape[0]
    C = 0.5 * (C + C.T)
    tr = jnp.trace(C) / k
    target = tr * jnp.eye(k, dtype=C.dtype)
    C = (1.0 - alpha) * C + alpha * target
    return C + ridge * jnp.maximum(tr, 1e-12) * jnp.eye(k, dtype=C.dtype)


def _stable_cholesky(C: jax.Array) -> jax.Array:
    """Cholesky with a fixed jitter ladder (reference losses.py:158).

    Tries jitters (0, 1e-6, 1e-4, 1e-2) x mean-trace; takes the first
    factorization with finite entries.
    """
    k = C.shape[0]
    tr = jnp.maximum(jnp.trace(C) / k, 1e-12)
    eye = jnp.eye(k, dtype=C.dtype)

    def try_jitter(jit_scale):
        L = jnp.linalg.cholesky(C + jit_scale * tr * eye)
        ok = jnp.all(jnp.isfinite(L))
        # double-where: re-factorize a SANITIZED matrix so the rung that
        # failed never contributes NaNs. jnp.where alone does not stop
        # the cholesky VJP of a failed rung from poisoning the gradient
        # (0 * NaN = NaN) — exactly in the ill-conditioned regime this
        # ladder exists for, training would silently diverge.
        C_safe = jnp.where(ok, C, eye)
        L_safe = jnp.linalg.cholesky(C_safe + jit_scale * tr * eye)
        return L_safe, ok

    L0, ok0 = try_jitter(0.0)
    L1, ok1 = try_jitter(1e-6)
    L2, ok2 = try_jitter(1e-4)
    L3, _ = try_jitter(1e-2)
    L = jnp.where(ok0, L0, jnp.where(ok1, L1, jnp.where(ok2, L2, L3)))
    return L


def vamp2_loss(
    z0: jax.Array,
    zt: jax.Array,
    *,
    ridge: float = 1e-4,
    alpha: float = 0.05,
    weights: Optional[jax.Array] = None,
    cond_penalty: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Negative VAMP-2 score of a batch of lagged CV pairs.

    Returns (loss, metrics). score = ||L00^-1 C0t L tt^-T||_F^2 via
    triangular solves (reference losses.py:40-143); optional
    log-condition-number penalty.
    """
    C00, C0t, Ctt = _covariances(z0, zt, weights)
    return vamp2_loss_from_covariances(
        C00, C0t, Ctt, ridge=ridge, alpha=alpha, cond_penalty=cond_penalty
    )


def vamp2_loss_from_covariances(
    C00: jax.Array,
    C0t: jax.Array,
    Ctt: jax.Array,
    *,
    ridge: float = 1e-4,
    alpha: float = 0.05,
    cond_penalty: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """VAMP-2 loss given mean-centered covariance blocks — the shared
    tail of vamp2_loss, exposed so data-parallel training can psum
    per-shard moments into global covariances first."""
    C00 = _regularize(C00, ridge, alpha)
    Ctt = _regularize(Ctt, ridge, alpha)

    L00 = _stable_cholesky(C00)
    Ltt = _stable_cholesky(Ctt)
    # K = L00^-1 C0t Ltt^-T
    tmp = jax.scipy.linalg.solve_triangular(L00, C0t, lower=True)
    K = jax.scipy.linalg.solve_triangular(Ltt, tmp.T, lower=True).T
    score = jnp.sum(K * K)

    # condition numbers via eigvalsh of the regularized covariances
    ev00 = jnp.linalg.eigvalsh(C00)
    evtt = jnp.linalg.eigvalsh(Ctt)
    cond00 = ev00[-1] / jnp.maximum(ev00[0], 1e-30)
    condtt = evtt[-1] / jnp.maximum(evtt[0], 1e-30)

    loss = -score
    if cond_penalty > 0:
        loss = loss + cond_penalty * (jnp.log(cond00) + jnp.log(condtt))

    metrics = {
        "vamp2": score.astype(jnp.float32),
        "cond_C00": cond00.astype(jnp.float32),
        "cond_Ctt": condtt.astype(jnp.float32),
        "output_variance": jnp.diag(C00).mean().astype(jnp.float32),
        "singular_sum": jnp.sqrt(score).astype(jnp.float32),
    }
    return loss.astype(jnp.float32), metrics


def vamp2_score_features(
    x0: jax.Array, xt: jax.Array, ridge: float = 1e-4
) -> float:
    """VAMP-2 proxy baseline on raw (scaled) features
    (reference core/history.py:57 vamp2_proxy)."""
    loss, metrics = vamp2_loss(jnp.asarray(x0), jnp.asarray(xt), ridge=ridge)
    return float(metrics["vamp2"])


__all__ = ["vamp2_loss", "vamp2_loss_from_covariances", "vamp2_score_features"]
