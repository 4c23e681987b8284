"""Utils + settings: seeding, SCC, json, parsing, config loader."""

import numpy as np
import pytest

from pmarlo_tpu.settings import load_defaults
from pmarlo_tpu.utils.config_utils import deep_merge
from pmarlo_tpu.utils.input_parsing import (
    parse_bins,
    parse_hidden_layers,
    parse_tau_schedule,
)
from pmarlo_tpu.utils.json_io import read_json, sanitize_for_json, write_json
from pmarlo_tpu.utils.msm_utils import macro_mfpt, macro_transition_matrix
from pmarlo_tpu.utils.scc import analyse_scc, strongly_connected_components
from pmarlo_tpu.utils.seed import choose_sim_seed, extract_seed, set_global_seed
from pmarlo_tpu.utils.thermodynamics import beta_per_kJ_mol, kT_kJ_per_mol


def test_seed_reproducibility():
    key1 = set_global_seed(42)
    a = np.random.rand(5)
    key2 = set_global_seed(42)
    b = np.random.rand(5)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(key1), np.asarray(key2))
    with pytest.raises(TypeError):
        set_global_seed("42")


def test_seed_helpers():
    assert choose_sim_seed(7) == 7
    assert isinstance(choose_sim_seed(None), int)
    assert extract_seed({"seed": 3}) == 3
    assert extract_seed(None, default=9) == 9


def test_thermodynamics():
    assert kT_kJ_per_mol(300.0) == pytest.approx(2.494, abs=0.01)
    assert beta_per_kJ_mol(300.0) == pytest.approx(1 / 2.494, abs=0.01)
    with pytest.raises(ValueError):
        kT_kJ_per_mol(-1)


def test_scc():
    adj = np.array([
        [0, 1, 0, 0],
        [1, 0, 0, 0],
        [0, 0, 0, 1],
        [0, 0, 1, 0],
    ])
    comps = strongly_connected_components(adj)
    assert sorted(sorted(c) for c in comps) == [[0, 1], [2, 3]]
    info = analyse_scc(adj.astype(float))
    assert info["n_components"] == 2 and not info["is_connected"]


def test_json_roundtrip(tmp_path):
    data = {
        "a": np.float32(1.5), "b": np.array([1, 2]), "c": np.nan,
        "d": {"e": np.int64(3)}, "p": tmp_path,
    }
    path = write_json(tmp_path / "x.json", data)
    loaded = read_json(path)
    assert loaded["a"] == 1.5
    assert loaded["b"] == [1, 2]
    assert loaded["c"] is None
    assert loaded["d"]["e"] == 3


def test_parsers():
    assert parse_tau_schedule("2,5,10") == [2, 5, 10]
    assert parse_hidden_layers([64, 64]) == [64, 64]
    assert parse_bins(32) == [32, 32]
    assert parse_bins("16,24") == [16, 24]
    with pytest.raises(ValueError):
        parse_tau_schedule("0,5")


def test_settings_loader(tmp_path, monkeypatch):
    cfg = load_defaults()
    assert cfg["bias_mode"] in ("harmonic_expansion", "metadynamics", "none")
    override = tmp_path / "override.yaml"
    override.write_text("bias_mode: metadynamics\nmd:\n  timestep_ps: 0.001\n")
    cfg2 = load_defaults(override)
    assert cfg2["bias_mode"] == "metadynamics"
    assert cfg2["md"]["timestep_ps"] == 0.001
    assert cfg2["md"]["friction_per_ps"] == 1.0  # deep-merged
    bad = tmp_path / "bad.yaml"
    bad.write_text("bias_mode: nonsense\nenable_cv_bias: false\nprecision: float32\ndevice_count: 1\n")
    with pytest.raises(ValueError, match="bias_mode"):
        load_defaults(bad)


def test_deep_merge():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = deep_merge(base, {"a": {"b": 10}, "e": 4})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # original untouched


def test_macro_lumping():
    T = np.array([
        [0.9, 0.1, 0.0],
        [0.1, 0.8, 0.1],
        [0.0, 0.1, 0.9],
    ])
    pi = np.array([0.25, 0.5, 0.25])
    assign = np.array([0, 0, 1])
    Tm = macro_transition_matrix(T, pi, assign)
    assert Tm.shape == (2, 2)
    np.testing.assert_allclose(Tm.sum(axis=1), 1.0)
    M = macro_mfpt(T, pi, assign)
    assert M[0, 1] > 0 and M[1, 0] > 0


def test_misc_helpers():
    import numpy as np
    import pytest

    from pmarlo_tpu.utils.misc import (
        all_finite,
        any_finite,
        base_shape_str,
        coerce_finite_float,
        coerce_finite_float_with_default,
        concatenate_or_empty,
        permutation_name,
        require,
        slugify,
        timestamp,
    )

    assert base_shape_str((3, 4, 5)) == "3x4x5"
    assert permutation_name((2, 0, 1)) == "2-0-1"
    ts = timestamp()
    assert len(ts) == 15 and ts[8] == "-"
    assert slugify("My Run #3!") == "my_run_3"
    assert slugify("") is None
    assert coerce_finite_float("2.5") == 2.5
    assert coerce_finite_float(float("nan")) is None
    assert coerce_finite_float("abc") is None
    assert coerce_finite_float_with_default(None, default=7.0) == 7.0
    assert all_finite([1.0, 2.0]) and not all_finite([1.0, float("inf")])
    assert any_finite([float("nan"), 3.0])
    with pytest.raises(ValueError):
        require(False, "boom")
    out = concatenate_or_empty([np.ones((2, 3)), np.zeros((1, 3))],
                               dtype=np.float32)
    assert out.shape == (3, 3) and out.dtype == np.float32
    empty = concatenate_or_empty([], dtype=np.int64, shape=(0, 4))
    assert empty.shape == (0, 4)
    with pytest.raises(ValueError):
        concatenate_or_empty([], dtype=np.int64)
