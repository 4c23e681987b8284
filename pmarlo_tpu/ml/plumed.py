"""PLUMED interop: export a trained DeepTICA CV for external engines.

The in-graph bias (bias/harmonic.py composes the CV via ``jax.grad``)
makes PLUMED unnecessary INSIDE this framework — but users who carry a
trained CV to an external engine (GROMACS/OpenMM + PLUMED) need the
reference's exit path (``/root/reference/src/pmarlo/features/deeptica/
_full.py:393-412``: ``to_torchscript`` + ``plumed_snippet``). The trace
reproduces the JAX model exactly: scaler -> MLP (optional
non-affine layernorm, eps 1e-6) -> optional output whitening; parity
is asserted in tests/unit/test_plumed_export.py to 1e-5.

torch is CPU-only in this image and used ONLY here (serialization
format for interop), never on the compute path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _torch_module(model):
    import torch

    cfg = model.config
    acts = {
        "tanh": torch.tanh,
        "relu": torch.relu,
        "elu": torch.nn.functional.elu,
        "gelu": torch.nn.functional.gelu,
    }
    if cfg.activation not in acts:
        raise ValueError(
            f"activation {cfg.activation!r} has no torch equivalent wired "
            f"(have {sorted(acts)})"
        )

    class DeepTICAModule(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer(
                "mean", torch.tensor(np.asarray(model.scaler_mean),
                                     dtype=torch.float32))
            self.register_buffer(
                "scale", torch.tensor(np.asarray(model.scaler_scale),
                                      dtype=torch.float32))
            self.ws = torch.nn.ParameterList()
            self.bs = torch.nn.ParameterList()
            for layer in model.params:
                self.ws.append(torch.nn.Parameter(torch.tensor(
                    np.asarray(layer["w"]), dtype=torch.float32)))
                self.bs.append(torch.nn.Parameter(torch.tensor(
                    np.asarray(layer["b"]), dtype=torch.float32)))
            self.layernorm = bool(cfg.layernorm)
            if model.whitening is not None:
                self.register_buffer(
                    "w_mean", torch.tensor(
                        np.asarray(model.whitening["mean"]),
                        dtype=torch.float32))
                self.register_buffer(
                    "w_t", torch.tensor(
                        np.asarray(model.whitening["transform"]),
                        dtype=torch.float32))
                self.whiten = True
            else:
                self.whiten = False
            self.act = acts[cfg.activation]

        def forward(self, x):
            h = (x - self.mean) / self.scale
            n = len(self.ws)
            for i in range(n - 1):
                h = h @ self.ws[i] + self.bs[i]
                if self.layernorm:
                    mu = h.mean(dim=-1, keepdim=True)
                    sd = torch.sqrt(h.var(dim=-1, unbiased=False,
                                          keepdim=True) + 1e-6)
                    h = (h - mu) / sd
                h = self.act(h)
            h = h @ self.ws[n - 1] + self.bs[n - 1]
            if self.whiten:
                h = (h - self.w_mean) @ self.w_t
            return h

    return DeepTICAModule()


def to_torchscript(model, path: "str | Path") -> Path:
    """Trace the CV to TorchScript (reference _full.py:393). Returns the
    ``.ts`` path."""
    import torch

    mod = _torch_module(model).eval()
    k = int(np.asarray(model.scaler_mean).shape[0])
    example = torch.zeros(1, k, dtype=torch.float32)
    ts = torch.jit.trace(mod, example)
    out = Path(path).with_suffix(".ts")
    out.parent.mkdir(parents=True, exist_ok=True)
    ts.save(str(out))
    return out


def plumed_snippet(model, model_path: "str | Path") -> str:
    """PLUMED input lines referencing the TorchScript export (reference
    _full.py:406-412 contract: a PYTORCH_MODEL line + one CV per
    output)."""
    ts = Path(model_path).with_suffix(".ts").name
    lines = [f"PYTORCH_MODEL FILE={ts} LABEL=mlcv"]
    for i in range(int(model.config.n_out)):
        lines.append(f"CV VALUE=mlcv.node-{i}")
    return "\n".join(lines) + "\n"


__all__ = ["to_torchscript", "plumed_snippet"]
