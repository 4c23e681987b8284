"""DeepTICA: MLP collective variables trained on the VAMP-2 objective.

Rebuild of the reference facade (src/pmarlo/features/deeptica/_full.py:166
DeepTICAConfig, :283 DeepTICAModel.transform, :354 load, :601
train_deeptica) and the curriculum trainer
(src/pmarlo/ml/deeptica/trainer.py:588 CurriculumConfig, :694 fit) as one
JAX module: the model is a pure function ``transform(params, x)``, training
is optax AdamW with warmup+cosine and gradient clipping, the tau curriculum
iterates short -> long with a fixed validation tau, and the best-val-score
parameters are checkpointed.

No TorchScript export exists or is needed: ``DeepTICAModel.as_function()``
returns a jittable closure that composes into the MD bias graph directly.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.seed import set_global_seed
from .losses import vamp2_loss
from .whitening import estimate_whitening


@dataclasses.dataclass(frozen=True)
class DeepTICAConfig:
    """(reference _full.py:166; defaults follow constants.py:81-121)."""

    lag: int = 10
    n_out: int = 2
    hidden: Tuple[int, ...] = (64, 64)
    activation: str = "tanh"             # tanh | gelu | relu | elu
    layernorm: bool = False
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    batch_size: int = 1024
    max_epochs: int = 200
    early_stopping_patience: int = 20
    tau_schedule: Tuple[int, ...] = ()   # curriculum; empty -> (lag,)
    val_tau: Optional[int] = None        # fixed validation tau (default: lag)
    val_fraction: float = 0.2
    vamp_ridge: float = 1e-4
    vamp_alpha: float = 0.05
    grad_clip: float = 10.0
    warmup_epochs: int = 5
    seed: int = 2024
    whitening_shrinkage: float = 0.1

    def __post_init__(self):
        if self.lag < 1:
            raise ValueError("lag must be >= 1")
        if self.n_out < 1:
            raise ValueError("n_out must be >= 1")
        if not (0.0 < self.val_fraction < 0.9):
            raise ValueError("val_fraction must be in (0, 0.9)")
        if self.activation not in ("tanh", "gelu", "relu", "elu"):
            raise ValueError(f"unknown activation {self.activation!r}")

    def schedule(self) -> Tuple[int, ...]:
        return self.tau_schedule if self.tau_schedule else (self.lag,)

    @classmethod
    def small_data(cls, lag: int = 5, **kw) -> "DeepTICAConfig":
        """Preset for small datasets (reference _full.py:214)."""
        defaults = dict(
            lag=lag, hidden=(32, 32), batch_size=256, max_epochs=100,
            vamp_alpha=0.1, learning_rate=5e-4,
        )
        defaults.update(kw)
        return cls(**defaults)


# --- MLP as pure functions -----------------------------------------------------

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
}


def init_mlp_params(
    key: jax.Array, n_in: int, hidden: Sequence[int], n_out: int
) -> List[Dict[str, jax.Array]]:
    sizes = [n_in, *hidden, n_out]
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / (a + b))
        params.append({
            "w": scale * jax.random.normal(sub, (a, b), dtype=jnp.float32),
            "b": jnp.zeros(b, dtype=jnp.float32),
        })
    return params


def mlp_apply(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    activation: str = "tanh",
    layernorm: bool = False,
) -> jax.Array:
    act = _ACTIVATIONS[activation]
    h = x
    for layer in params[:-1]:
        h = h @ layer["w"] + layer["b"]
        if layernorm:
            mu = h.mean(axis=-1, keepdims=True)
            sd = jnp.sqrt(h.var(axis=-1, keepdims=True) + 1e-6)
            h = (h - mu) / sd
        h = act(h)
    last = params[-1]
    return h @ last["w"] + last["b"]


# --- model wrapper ---------------------------------------------------------------

@dataclasses.dataclass
class DeepTICAModel:
    """Scaler -> MLP -> output whitening (reference _full.py:283).

    ``transform`` runs host/device-agnostic; ``as_function`` returns the
    pure jittable CV function for in-graph bias composition.
    """

    config: DeepTICAConfig
    params: List[Dict[str, jax.Array]]
    scaler_mean: np.ndarray
    scaler_scale: np.ndarray
    whitening: Optional[Dict] = None
    training_history: Optional[Dict] = None

    def as_function(self) -> Callable[[jax.Array], jax.Array]:
        """Pure CV function x (.., K) -> cv (.., n_out), fully traceable."""
        mean = jnp.asarray(self.scaler_mean, dtype=jnp.float32)
        scale = jnp.asarray(self.scaler_scale, dtype=jnp.float32)
        cfg = self.config
        params = self.params
        if self.whitening is not None:
            w_mean = jnp.asarray(self.whitening["mean"], dtype=jnp.float32)
            w_t = jnp.asarray(self.whitening["transform"], dtype=jnp.float32)
        else:
            w_mean = w_t = None

        def fn(x):
            z = (x - mean) / scale
            y = mlp_apply(params, z, cfg.activation, cfg.layernorm)
            if w_t is not None:
                y = (y - w_mean) @ w_t
            return y

        return fn

    def transform(self, X) -> np.ndarray:
        fn = self.as_function()
        return np.asarray(fn(jnp.asarray(np.asarray(X), dtype=jnp.float32)))

    __call__ = transform

    def to_torchscript(self, path) -> "Path":
        """Export the CV as TorchScript for external engines (reference
        _full.py:393; ml/plumed.py)."""
        from .plumed import to_torchscript

        return to_torchscript(self, path)

    def plumed_snippet(self, model_path) -> str:
        """PLUMED input referencing the TorchScript export (reference
        _full.py:406)."""
        from .plumed import plumed_snippet

        return plumed_snippet(self, model_path)

    # --- persistence (reference _full.py:311-387 json+pt+scaler+history) ----

    def save(self, prefix: "str | Path") -> Path:
        prefix = Path(prefix)
        prefix.parent.mkdir(parents=True, exist_ok=True)
        cfg = dataclasses.asdict(self.config)
        cfg["hidden"] = list(cfg["hidden"])
        cfg["tau_schedule"] = list(cfg["tau_schedule"])
        (prefix.with_suffix(".json")).write_text(json.dumps(cfg, indent=2))
        arrays = {"scaler_mean": self.scaler_mean, "scaler_scale": self.scaler_scale}
        for i, layer in enumerate(self.params):
            arrays[f"w{i}"] = np.asarray(layer["w"])
            arrays[f"b{i}"] = np.asarray(layer["b"])
        if self.whitening is not None:
            arrays["whitening_mean"] = np.asarray(self.whitening["mean"])
            arrays["whitening_transform"] = np.asarray(self.whitening["transform"])
        np.savez(prefix.with_suffix(".weights.npz"), **arrays)
        if self.training_history is not None:
            from ..utils.json_io import write_json

            write_json(prefix.with_suffix(".history.json"), self.training_history)
        return prefix

    @classmethod
    def load(cls, prefix: "str | Path") -> "DeepTICAModel":
        prefix = Path(prefix)
        cfg_d = json.loads(prefix.with_suffix(".json").read_text())
        cfg_d["hidden"] = tuple(cfg_d["hidden"])
        cfg_d["tau_schedule"] = tuple(cfg_d["tau_schedule"])
        config = DeepTICAConfig(**cfg_d)
        with np.load(prefix.with_suffix(".weights.npz")) as data:
            params = []
            i = 0
            while f"w{i}" in data:
                params.append({
                    "w": jnp.asarray(data[f"w{i}"]),
                    "b": jnp.asarray(data[f"b{i}"]),
                })
                i += 1
            whitening = None
            if "whitening_mean" in data:
                whitening = {
                    "mean": np.asarray(data["whitening_mean"]),
                    "transform": np.asarray(data["whitening_transform"]),
                    "applied": True,
                }
            scaler_mean = np.asarray(data["scaler_mean"])
            scaler_scale = np.asarray(data["scaler_scale"])
        history = None
        hist_path = prefix.with_suffix(".history.json")
        if hist_path.exists():
            history = json.loads(hist_path.read_text())
        return cls(
            config=config, params=params, scaler_mean=scaler_mean,
            scaler_scale=scaler_scale, whitening=whitening,
            training_history=history,
        )


# --- training ------------------------------------------------------------------

def _fit_scaler(X: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mean = X.mean(axis=0)
    scale = X.std(axis=0)
    scale[scale < 1e-8] = 1.0
    return mean, scale


def _segment_pairs(lengths: Sequence[int], tau: int) -> Tuple[np.ndarray, np.ndarray]:
    from ..features.pairs import segment_lagged_pairs

    return segment_lagged_pairs(lengths, tau)


def train_deeptica(
    X_list: "np.ndarray | Sequence[np.ndarray]",
    config: Optional[DeepTICAConfig] = None,
    *,
    weights: Optional[Sequence[np.ndarray]] = None,
    progress_dir: Optional["str | Path"] = None,
) -> DeepTICAModel:
    """Train DeepTICA on one or more feature trajectories
    (reference _full.py:601 train_deeptica -> trainer_api.py:327 pipeline).

    Pipeline: seed -> scaler -> net init -> tau-curriculum training with a
    fixed validation tau on a time-ordered split -> best-state restore ->
    output whitening -> history with VAMP-2 before/after.
    """
    config = config or DeepTICAConfig()
    if isinstance(X_list, np.ndarray) or hasattr(X_list, "shape"):
        X_list = [np.asarray(X_list)]
    X_list = [np.asarray(x, dtype=np.float32) for x in X_list]
    if any(x.ndim != 2 for x in X_list):
        raise ValueError("each trajectory must be (T, K)")
    key = set_global_seed(config.seed)

    X_all = np.concatenate(X_list, axis=0)
    mean, scale = _fit_scaler(X_all)
    Z_list = [(x - mean) / scale for x in X_list]

    # time-ordered train/val split per trajectory (reference trainer.py:1103)
    train_seqs, val_seqs = [], []
    for z in Z_list:
        cut = max(int(len(z) * (1.0 - config.val_fraction)), 2)
        train_seqs.append(z[:cut])
        val_seqs.append(z[cut:])
    val_tau = config.val_tau or config.lag

    n_in = X_all.shape[1]
    key, sub = jax.random.split(key)
    params = init_mlp_params(sub, n_in, config.hidden, config.n_out)

    # optimizer: AdamW + warmup+cosine (reference trainer.py:960) + clip
    steps_per_epoch = max(
        sum(max(len(z) - min(config.schedule()), 0) for z in train_seqs)
        // config.batch_size, 1,
    )
    total_steps = steps_per_epoch * config.max_epochs * len(config.schedule())
    lr_schedule = optax.warmup_cosine_decay_schedule(
        init_value=config.learning_rate * 0.01,
        peak_value=config.learning_rate,
        warmup_steps=config.warmup_epochs * steps_per_epoch,
        decay_steps=max(total_steps, config.warmup_epochs * steps_per_epoch + 1),
        end_value=config.learning_rate * 0.01,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(lr_schedule, weight_decay=config.weight_decay),
    )
    opt_state = tx.init(params)

    cfg = config

    def _step_math(params, opt_state, z0, zt):
        def loss_fn(p):
            y0 = mlp_apply(p, z0, cfg.activation, cfg.layernorm)
            yt = mlp_apply(p, zt, cfg.activation, cfg.layernorm)
            return vamp2_loss(y0, yt, ridge=cfg.vamp_ridge, alpha=cfg.vamp_alpha)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = grad_norm
        return params, opt_state, loss, metrics

    @jax.jit
    def epoch_scan(params, opt_state, z0_batches, zt_batches):
        """One epoch as a lax.scan over pre-shuffled batches — a single
        device dispatch per epoch instead of one per minibatch (the
        reference's torch DataLoader loop has no TPU equivalent cost)."""

        def body(carry, batch):
            params, opt_state = carry
            z0b, ztb = batch
            params, opt_state, loss, metrics = _step_math(
                params, opt_state, z0b, ztb
            )
            return (params, opt_state), (
                loss, metrics["cond_C00"], metrics["grad_norm"]
            )

        (params, opt_state), (losses, conds, gnorms) = jax.lax.scan(
            body, (params, opt_state), (z0_batches, zt_batches)
        )
        return params, opt_state, losses.mean(), conds[-1], gnorms[-1]

    @jax.jit
    def eval_score(params, z0, zt):
        y0 = mlp_apply(params, z0, cfg.activation, cfg.layernorm)
        yt = mlp_apply(params, zt, cfg.activation, cfg.layernorm)
        _, metrics = vamp2_loss(y0, yt, ridge=cfg.vamp_ridge, alpha=cfg.vamp_alpha)
        return metrics["vamp2"]

    def gather_pairs(seqs, tau):
        lengths = [len(s) for s in seqs]
        i, j = _segment_pairs(lengths, tau)
        Z = np.concatenate(seqs, axis=0) if seqs else np.zeros((0, n_in))
        return Z[i], Z[j]

    # baseline VAMP-2 on raw scaled features (reference trainer_api vamp2_proxy)
    z0_b, zt_b = gather_pairs(train_seqs, config.lag)
    from .losses import vamp2_score_features

    vamp2_before = (
        vamp2_score_features(z0_b[:8192], zt_b[:8192]) if len(z0_b) > 10 else float("nan")
    )

    val_z0, val_zt = gather_pairs(val_seqs, val_tau)
    has_val = len(val_z0) > config.n_out + 2

    history: Dict = {
        "epochs": [], "tau_schedule": list(config.schedule()),
        "val_tau": val_tau, "vamp2_before": vamp2_before,
    }
    best = {"score": -np.inf, "params": params, "epoch": -1, "tau": None}
    rng = np.random.default_rng(config.seed)
    t_start = time.time()
    progress_path = Path(progress_dir) / "training_progress.json" if progress_dir else None

    for tau in config.schedule():
        z0_all, zt_all = gather_pairs(train_seqs, tau)
        if len(z0_all) < config.batch_size // 4:
            raise ValueError(
                f"too few training pairs ({len(z0_all)}) at tau={tau}"
            )
        patience_left = config.early_stopping_patience
        bs = min(config.batch_size, len(z0_all))
        n_batches = max(len(z0_all) // bs, 1)
        for epoch in range(config.max_epochs):
            perm = rng.permutation(len(z0_all))[: n_batches * bs]
            z0_b = jnp.asarray(z0_all[perm].reshape(n_batches, bs, -1))
            zt_b = jnp.asarray(zt_all[perm].reshape(n_batches, bs, -1))
            params, opt_state, mean_loss, cond, gnorm = epoch_scan(
                params, opt_state, z0_b, zt_b
            )
            if has_val:
                val_score = float(eval_score(params, jnp.asarray(val_z0), jnp.asarray(val_zt)))
            else:
                val_score = -float(mean_loss)
            record = {
                "tau": int(tau), "epoch": int(epoch),
                "train_loss": float(mean_loss),
                "val_vamp2": val_score,
                "cond_C00": float(cond),
                "grad_norm": float(gnorm),
                "wall_time_s": time.time() - t_start,
            }
            history["epochs"].append(record)
            if progress_path is not None:
                from ..utils.json_io import write_json

                write_json(progress_path, {"status": "training", **record})
            if val_score > best["score"]:
                best = {
                    "score": val_score,
                    "params": jax.tree_util.tree_map(lambda a: a.copy(), params),
                    "epoch": epoch, "tau": int(tau),
                }
                patience_left = config.early_stopping_patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    break

    params = best["params"] if best["epoch"] >= 0 else params
    history["best"] = {"val_vamp2": best["score"], "epoch": best["epoch"], "tau": best["tau"]}

    # output whitening from full-data outputs (reference core/model.py:152)
    model = DeepTICAModel(
        config=config, params=params, scaler_mean=mean, scaler_scale=scale,
    )
    Y = model.transform(X_all)
    whitening = estimate_whitening(Y, shrinkage=config.whitening_shrinkage)
    model.whitening = whitening

    # VAMP-2 after training (on whitened outputs at the training lag)
    y_list = [model.transform(x) for x in X_list]
    y0, yt = gather_pairs([y.astype(np.float32) for y in y_list], config.lag)
    vamp2_after = (
        vamp2_score_features(y0[:8192], yt[:8192]) if len(y0) > 10 else float("nan")
    )
    history["vamp2_after"] = vamp2_after
    history["wall_time_s"] = time.time() - t_start
    model.training_history = history
    if progress_path is not None:
        from ..utils.json_io import write_json

        write_json(progress_path, {"status": "completed", **history["best"]})
    return model


__all__ = [
    "DeepTICAConfig",
    "DeepTICAModel",
    "train_deeptica",
    "init_mlp_params",
    "mlp_apply",
]
