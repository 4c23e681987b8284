"""API facade: caching, macro helpers, FES minima picking, profiles."""

import numpy as np
import pytest

from pmarlo_tpu.api import (
    FEATURE_PROFILES,
    clear_feature_cache,
    compute_features,
    compute_macrostates,
    get_feature_profile,
    macrostate_mfpt,
    macrostate_populations,
    macrostate_transition_matrix,
    select_fes_pair,
)
from pmarlo_tpu.api.fes import (
    find_local_minima_2d,
    generate_fes_and_pick_minima,
    pick_frames_around_minima,
)


def test_feature_cache(alanine_system, topology_info):
    _, positions, _ = alanine_system
    traj = np.asarray(positions)[None].repeat(3, 0)
    clear_feature_cache()
    X1, _ = compute_features(traj, "phi_psi", topology_info)
    X2, _ = compute_features(traj, "phi_psi", topology_info)
    assert X1 is X2  # cache hit returns the same object
    X3, _ = compute_features(traj, "phi_psi", topology_info, use_cache=False)
    assert X3 is not X1
    np.testing.assert_allclose(X1, X3)


def test_macro_helpers():
    T = np.array([
        [0.95, 0.05, 0.00, 0.00],
        [0.05, 0.90, 0.05, 0.00],
        [0.00, 0.05, 0.90, 0.05],
        [0.00, 0.00, 0.05, 0.95],
    ])
    labels, chi = compute_macrostates(T, 2)
    pops = macrostate_populations(
        np.full(4, 0.25), labels
    )
    np.testing.assert_allclose(pops.sum(), 1.0)
    Tm = macrostate_transition_matrix(T, np.full(4, 0.25), labels)
    np.testing.assert_allclose(Tm.sum(axis=1), 1.0)
    M = macrostate_mfpt(T, np.full(4, 0.25), labels)
    assert (M[M > 0] > 1).all()


def test_select_fes_pair():
    assert select_fes_pair(["cos(phi[0])", "sin(psi[0])", "rg"]) == (0, 1)
    assert select_fes_pair(["a", "b", "c"]) == (0, 1)
    with pytest.raises(ValueError):
        select_fes_pair(["only_one"])


def test_local_minima_and_frame_picking():
    F = np.full((10, 10), 5.0)
    F[2, 2] = 0.0
    F[7, 7] = 1.0
    minima = find_local_minima_2d(F)
    assert (2, 2) in minima and (7, 7) in minima

    rng = np.random.default_rng(0)
    cv1 = np.concatenate([rng.normal(-1, 0.1, 500), rng.normal(1, 0.1, 500)])
    cv2 = np.concatenate([rng.normal(-1, 0.1, 500), rng.normal(1, 0.1, 500)])
    fes, picks = generate_fes_and_pick_minima(cv1, cv2, bins=16, delta_f_kj=3.0)
    assert len(picks) >= 2
    total = sum(len(v) for v in picks.values())
    assert total > 0


def test_feature_profiles():
    assert "backbone" in FEATURE_PROFILES
    p = get_feature_profile("backbone", for_bias=True)
    assert p.bias_compatible
    with pytest.raises(ValueError, match="not CV-bias compatible"):
        get_feature_profile("universal", for_bias=True)
    with pytest.raises(KeyError):
        get_feature_profile("nope")


def test_lazy_root_exports():
    import pmarlo_tpu

    assert callable(pmarlo_tpu.run_segment)
    assert callable(pmarlo_tpu.train_deeptica)
    assert callable(pmarlo_tpu.find_conformations)
    assert pmarlo_tpu.get_version()
    with pytest.raises(AttributeError):
        pmarlo_tpu.does_not_exist
