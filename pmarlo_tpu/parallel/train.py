"""Data-parallel DeepTICA training step: shard_map over the batch axis.

Scaling story (SURVEY section 2c): the reference's torch DataLoader
workers shard host-side batch PREP; actual training is single-device.
Here the training step itself is SPMD: lagged pairs shard over the mesh's
data axis, each device runs the MLP forward on its shard, the VAMP-2
covariance moments are psum'ed over ICI into exact global covariances;
the psum transposes in the backward pass make every device's autodiff
result the full-batch gradient, so the replicated optimizer step keeps
parameters identical on every device — one step, N-fold batch
throughput.

Exactness: because the VAMP-2 loss is a function of GLOBAL covariance
sums, the sharded step computes the same loss and the same parameter
update as the serial step on the concatenated batch (parity-tested on an
8-device CPU mesh in tests/unit/test_parallel_train.py) — this is not
gradient averaging over micro-batches, it is the serial math distributed.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..ml.deeptica import DeepTICAConfig, mlp_apply
from ..ml.losses import vamp2_loss_from_covariances


def make_data_parallel_step(
    config: DeepTICAConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: "str | None" = None,
) -> Callable:
    """``step(params, opt_state, z0, zt) -> (params, opt_state, loss)``.

    ``z0``/``zt`` are the (B, K) lagged-pair batch; B must divide the
    mesh's ``axis`` size. Parameters and optimizer state are replicated;
    the returned update is identical on every device.
    """
    from jax.experimental.shard_map import shard_map

    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]

    def _local_step(params, opt_state, z0, zt):
        n_local = z0.shape[0]
        n_global = n_local * n_dev

        def loss_fn(p):
            y0 = mlp_apply(p, z0, config.activation, config.layernorm)
            yt = mlp_apply(p, zt, config.activation, config.layernorm)
            # exact global mean-centered covariances, two-pass deviation
            # form (the raw-moment form M/n - m m^T loses f32 precision
            # and perturbs small gradient components vs the serial math)
            m0 = jax.lax.psum(jnp.sum(y0, axis=0), axis) / n_global
            mt = jax.lax.psum(jnp.sum(yt, axis=0), axis) / n_global
            a = y0 - m0
            b = yt - mt
            C00 = jax.lax.psum(a.T @ a, axis) / n_global
            C0t = jax.lax.psum(a.T @ b, axis) / n_global
            Ctt = jax.lax.psum(b.T @ b, axis) / n_global
            loss, metrics = vamp2_loss_from_covariances(
                C00, C0t, Ctt, ridge=config.vamp_ridge,
                alpha=config.vamp_alpha,
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # grads are already GLOBAL: the transpose of the in-loss psums
        # re-psums the cotangents, so every device's autodiff result is
        # the full-batch gradient (an extra psum here would scale by
        # n_dev — measured 8x on the parity test)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=True,
    )
    return jax.jit(sharded)


def train_deeptica_data_parallel(
    z0, zt,
    config: DeepTICAConfig,
    mesh: Mesh,
    *,
    n_epochs: int = 20,
    axis: "str | None" = None,
) -> Tuple[list, list]:
    """Minimal sharded training loop over a fixed pair set; returns
    (params, per-epoch losses). The full curriculum/persistence pipeline
    stays in ml.deeptica.train_deeptica — this is the scale-out engine
    for when one chip's batch throughput is the bottleneck."""
    from ..ml.deeptica import init_mlp_params
    from ..utils.seed import set_global_seed

    key = set_global_seed(config.seed)
    n_in = z0.shape[1]
    params = init_mlp_params(key, n_in, config.hidden, config.n_out)
    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(config.learning_rate,
                    weight_decay=config.weight_decay),
    )
    opt_state = tx.init(params)
    step = make_data_parallel_step(config, tx, mesh, axis)
    z0 = jnp.asarray(z0, jnp.float32)
    zt = jnp.asarray(zt, jnp.float32)
    losses = []
    for _ in range(n_epochs):
        params, opt_state, loss = step(params, opt_state, z0, zt)
        losses.append(float(loss))
    return params, losses


__all__ = ["make_data_parallel_step", "train_deeptica_data_parallel"]
