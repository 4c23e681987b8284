"""Matplotlib visualization (reference: src/pmarlo/visualization/,
markov_state_model/_plots.py, _tpt_viz.py, conformations/visualizations.py)."""

from .plots import (
    plot_fes,
    plot_its,
    plot_ck,
    plot_ramachandran,
    plot_committors,
    plot_flux_network,
    plot_acceptance_matrix,
    plot_sampling_validation,
    plot_frames_per_shard,
)

__all__ = [
    "plot_fes",
    "plot_its",
    "plot_ck",
    "plot_ramachandran",
    "plot_committors",
    "plot_flux_network",
    "plot_acceptance_matrix",
    "plot_sampling_validation",
    "plot_frames_per_shard",
]
