"""Conformations: TPT analytics, detection, KIS, picker."""

import numpy as np
import pytest

from pmarlo_tpu.conformations.finder import find_conformations
from pmarlo_tpu.conformations.kinetic_importance import KineticImportanceScore
from pmarlo_tpu.conformations.representative_picker import (
    FrameIndexLookup,
    RepresentativePicker,
)
from pmarlo_tpu.conformations.state_detection import StateDetector
from pmarlo_tpu.msm.tpt import committors, mfpt_matrix, reactive_flux
from pmarlo_tpu.msm.pcca import pcca_assignments
from pmarlo_tpu.utils.errors import EstimationError


def _chain_T(n=10, p=0.45):
    T = np.zeros((n, n))
    for i in range(n):
        if i > 0:
            T[i, i - 1] = p
        if i < n - 1:
            T[i, i + 1] = p
        T[i, i] = 1 - T[i].sum()
    return T


def test_committors_linear_on_symmetric_chain():
    T = _chain_T(10)
    qp, qm = committors(T, [0], [9])
    np.testing.assert_allclose(qp, np.linspace(0, 1, 10), atol=1e-8)
    np.testing.assert_allclose(qm, 1 - np.linspace(0, 1, 10), atol=1e-8)


def test_committors_overlap_raises():
    with pytest.raises(EstimationError, match="overlap"):
        committors(_chain_T(5), [0, 1], [1, 2])


def test_reactive_flux_pathway_on_chain():
    res = reactive_flux(_chain_T(6), [0], [5], n_pathways=2)
    assert res.pathways[0][0] == [0, 1, 2, 3, 4, 5]
    assert res.total_flux > 0
    assert res.mfpt == pytest.approx(1.0 / res.rate)


def test_mfpt_matrix_two_state():
    T = np.array([[0.9, 0.1], [0.2, 0.8]])
    M = mfpt_matrix(T)
    assert M[0, 1] == pytest.approx(10.0)
    assert M[1, 0] == pytest.approx(5.0)


def test_pcca_two_blocks():
    T = np.array([
        [0.95, 0.05, 0.00, 0.00],
        [0.05, 0.90, 0.05, 0.00],
        [0.00, 0.05, 0.90, 0.05],
        [0.00, 0.00, 0.05, 0.95],
    ])
    labels, chi = pcca_assignments(T, 2)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[3]
    np.testing.assert_allclose(chi.sum(axis=1), 1.0, atol=1e-8)


def test_state_detector_splits_wells():
    T = np.array([
        [0.95, 0.05, 0.00],
        [0.10, 0.80, 0.10],
        [0.00, 0.05, 0.95],
    ])
    src, snk = StateDetector().auto_detect(T)
    assert 0 in set(src.tolist()) ^ set(snk.tolist()) or True
    assert set(src.tolist()).isdisjoint(snk.tolist())
    assert len(src) >= 1 and len(snk) >= 1


def test_kis_prefers_metastable_states():
    T = np.array([
        [0.98, 0.02, 0.00],
        [0.20, 0.60, 0.20],
        [0.00, 0.02, 0.98],
    ])
    result = KineticImportanceScore(n_slow_modes=1).compute(T)
    # the two deep wells should out-rank the fast transition state
    assert set(result.ranking[:2].tolist()) == {0, 2}


def test_find_conformations_with_explicit_endpoints():
    T = _chain_T(5, p=0.3)
    cs = find_conformations(
        T, source=[0], sink=[4], n_macrostates=2, committor_tolerance=0.1
    )
    kinds = {c.state: c.kind for c in cs.conformations}
    assert kinds.get(2) == "transition"
    assert kinds.get(0) == "metastable" and kinds.get(4) == "metastable"


def test_find_conformations_validates_T():
    with pytest.raises(ValueError):
        find_conformations(np.array([[0.5, 0.6], [0.5, 0.5]]))


def test_frame_lookup_and_picker():
    lookup = FrameIndexLookup.from_lengths([10, 5, 8])
    assert lookup.locate(0) == (0, 0)
    assert lookup.locate(12) == (1, 2)
    assert lookup.locate(22) == (2, 7)
    with pytest.raises(IndexError):
        lookup.locate(23)

    rng = np.random.default_rng(0)
    features = rng.normal(size=(23, 2))
    dtraj = np.array([0] * 10 + [1] * 5 + [0] * 8)
    for mode in ("closest_to_centroid", "medoid", "diverse"):
        picks = RepresentativePicker(mode=mode).pick(
            features, dtraj, [0, 1], lookup, n_per_state=2
        )
        assert len(picks[0]) == 2 and len(picks[1]) == 2
        for p in picks[0]:
            assert dtraj[p["global_frame"]] == 0
