"""TPU-native MD core: system building, forces, integration, minimization.

Replaces the reference's OpenMM backend (src/pmarlo/simulation/__init__.py:18-112)
with a pure-JAX implementation: the ``System`` is a pytree of parameter
arrays, ``potential_energy`` is a jittable function, forces are
``jax.grad``, and the integrator is a ``lax.scan``-able step — so replicas
batch with ``vmap`` and bias potentials fuse by function composition.
"""

from .system import System
from .forcefield import build_system
from .forces import potential_energy, compute_forces
from .integrate import MDState, langevin_step, run_md, thermalize
from .minimize import minimize_energy


def build_pair_force_fn(*args, **kwargs):
    """Lazy re-export of md.pallas_pair.build_pair_force_fn (the
    protein-scale tiled-kernel force path)."""
    from .pallas_pair import build_pair_force_fn as _fn

    return _fn(*args, **kwargs)


def load_amber_files(*args, **kwargs):
    """Lazy re-export of md.amber_params.load_amber_files (register
    user-supplied frcmod/parm.dat/OFF-.lib parameter files — the
    lipid17/OL15/OL3 escape hatch while the data files are absent
    from this image)."""
    from .amber_params import load_amber_files as _fn

    return _fn(*args, **kwargs)


__all__ = [
    "System",
    "build_system",
    "potential_energy",
    "compute_forces",
    "MDState",
    "langevin_step",
    "run_md",
    "thermalize",
    "minimize_energy",
    "build_pair_force_fn",
    "load_amber_files",
]
