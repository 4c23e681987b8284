"""Name-level API parity with the reference facade.

The reference exports 41 helpers from ``pmarlo.api`` (reference:
src/pmarlo/api/__init__.py:53-95) and a small lazy top-level surface
(src/pmarlo/__init__.py:18-67). A user switching frameworks should find
every one of those names; this test pins the full list so a refactor
cannot silently drop one.
"""

import numpy as np
import pytest

import pmarlo_tpu
import pmarlo_tpu.api as api

# the reference's api/__init__.py __all__, verbatim
REFERENCE_API_ALL = [
    "align_trajectory", "analyze_msm", "choose_sim_seed",
    "build_msm_from_labels", "cluster_microstates", "coerce_path_list",
    "compute_features", "compute_macrostates", "compute_universal_embedding",
    "compute_universal_metric", "deep_merge", "extract_last_frame_to_pdb",
    "extract_seed", "FEATURE_PROFILES", "FeatureProfile",
    "find_conformations_from_msm", "generate_fes_and_pick_minima",
    "generate_free_energy_surface", "get_feature_profile_info",
    "load_feature_profile", "macro_mfpt", "macro_transition_matrix",
    "macrostate_populations", "normalize_training_metrics", "parse_bins",
    "parse_hidden_layers", "parse_tau_schedule", "parse_temperature_ladder",
    "reduce_features", "relativize", "resolve_deeptica", "sanitize",
    "sanitize_deeptica_payload", "sanitize_label_for_filename",
    "select_fes_pair", "slugify", "timestamp", "trig_expand_periodic",
    "validate_profile_for_cv_biasing", "write_json",
]

REFERENCE_TOP_LEVEL = [
    "Protein", "MarkovStateModel", "candidate_lag_ladder", "api",
    "visualization", "FESResult", "PMFResult", "generate_1d_pmf",
    "generate_2d_fes",
]


def test_reference_api_names_all_present():
    missing = [n for n in REFERENCE_API_ALL if not hasattr(api, n)]
    assert not missing, f"api facade lost reference names: {missing}"


def test_reference_top_level_names_all_present():
    missing = [n for n in REFERENCE_TOP_LEVEL if not hasattr(pmarlo_tpu, n)]
    assert not missing, f"top-level lost reference names: {missing}"


def test_macro_aliases_are_same_objects():
    assert api.macro_mfpt is api.macrostate_mfpt
    assert api.macro_transition_matrix is api.macrostate_transition_matrix


def test_path_helpers(tmp_path):
    paths = api.coerce_path_list(["a.txt", tmp_path / "b.txt"])
    assert all(p.is_absolute() for p in paths)
    assert api.relativize(tmp_path / "x" / "y.npz", tmp_path) == "x/y.npz"
    # disjoint roots fall back to the absolute path
    assert api.relativize("/etc/hosts", tmp_path) == "/etc/hosts"


def test_load_feature_profile_molecular_custom(tmp_path):
    spec = tmp_path / "spec.yaml"
    spec.write_text(
        "features:\n"
        "  - type: distance\n    atom_indices: [0, 5]\n"
        "  - type: angle\n    atom_indices: [0, 1, 2]\n"
        "  - type: dihedral\n    atom_indices: [0, 1, 2, 3]\n"
    )
    prof = api.load_feature_profile("molecular_custom", spec)
    assert prof.spec == (
        "distance([0, 5])", "angle([0, 1, 2])", "dihedral([0, 1, 2, 3])"
    )
    info = api.get_feature_profile_info("molecular_custom", spec)
    assert info["spec_status"] == "ok" and info["feature_count"] == 3
    with pytest.raises(ValueError, match="spec_path"):
        api.load_feature_profile("molecular_custom")
    with pytest.raises(FileNotFoundError):
        api.load_feature_profile("molecular_custom", tmp_path / "nope.yaml")
    # wrong arity fails fast
    bad = tmp_path / "bad.yaml"
    bad.write_text("features:\n  - type: distance\n    atom_indices: [0]\n")
    with pytest.raises(ValueError, match="atom_indices"):
        api.load_feature_profile("molecular_custom", bad)


def test_profile_info_and_bias_validation():
    info = api.get_feature_profile_info("backbone")
    assert info["exists"] and info["cv_biasing_compatible"]
    assert info["feature_count"] == 1
    assert api.get_feature_profile_info("nope") == {
        "exists": False, "name": "nope"
    }
    ok, _ = api.validate_profile_for_cv_biasing("backbone")
    assert ok
    ok, reason = api.validate_profile_for_cv_biasing("universal")
    assert not ok and "bias" in reason.lower()
    ok, reason = api.validate_profile_for_cv_biasing("nope")
    assert not ok and "Unknown" in reason


def test_normalize_training_metrics_shapes():
    assert api.normalize_training_metrics(None) == {}
    # TPU trainer history: explicit best wins
    h = {"best": {"val_vamp2": 1.9, "epoch": 7, "tau": 10}, "epochs": []}
    n = api.normalize_training_metrics(h)
    assert (n["best_val_score"], n["best_epoch"], n["best_tau"]) == (1.9, 7, 10)
    # epoch records: inferred
    h = {"epochs": [
        {"epoch": 0, "tau": 2, "val_vamp2": 0.5},
        {"epoch": 1, "tau": 4, "val_vamp2": float("nan")},
        {"epoch": 2, "tau": 4, "val_vamp2": 1.5},
    ]}
    n = api.normalize_training_metrics(h)
    assert (n["best_val_score"], n["best_tau"]) == (1.5, 4)
    # reference flat curve + tau schedule
    n = api.normalize_training_metrics(
        {"val_score_curve": [0.2, 0.8, 0.3, 0.4]},
        tau_schedule=[5, 20], epochs_per_tau=2,
    )
    assert n["best_epoch"] == 1 and n["best_tau"] == 5


def test_resolve_and_sanitize_deeptica():
    assert api.resolve_deeptica({}) == (False, None)
    assert api.resolve_deeptica({"deeptica": {"enabled": False}}) == (
        False, None
    )
    en, cfg = api.resolve_deeptica(
        {"deeptica": {"min_pairs": "32", "skip_on_failure": 0, "lag": 5}}
    )
    assert en and cfg == {"min_pairs": 32, "skip_on_failure": False, "lag": 5}
    en, cfg = api.resolve_deeptica({"deeptica": {"min_pairs": "oops"}})
    assert en and cfg is None
    p = api.sanitize_deeptica_payload({
        "applied": True, "secret": "x",
        "attempts": [{"lag": i, "status": "ok"} for i in range(9)],
    })
    assert p["applied"] and "secret" not in p and len(p["attempts"]) == 5


def test_generate_free_energy_surface_standalone():
    rng = np.random.default_rng(1)
    fes = api.generate_free_energy_surface(
        rng.normal(size=400), rng.normal(size=400),
        bins=12, temperature=310.0,
    )
    assert fes.temperature_K == 310.0
    assert np.isfinite(np.nanmin(fes.free_energy))
    assert np.nanmin(fes.free_energy) == 0.0  # FES anchored at 0
