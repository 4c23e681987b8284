"""Test configuration: force the CPU backend with 8 virtual devices.

The real TPU (axon tunnel) takes minutes per first compile; tests default
to CPU (reference pattern: tests stub out heavy backends,
tests/conftest.py:18-120 in the reference repo). The 8-device host platform
exercises the multi-chip sharding paths without hardware.

Opt-in real-chip mode: ``PMARLO_TPU_TESTS=1`` leaves the axon platform
active so the ``*_on_tpu`` tests (fused REMD / metadynamics / pallas chunk
Mosaic lowering) actually run instead of being permanently skipped. Run
them selectively, e.g.::

    PMARLO_TPU_TESTS=1 python -m pytest tests/ -k on_tpu -q
"""

import os

RUN_ON_TPU = os.environ.get("PMARLO_TPU_TESTS", "") == "1"

if not RUN_ON_TPU:
    # The axon sitecustomize imports jax at interpreter start with
    # JAX_PLATFORMS=axon, so env-var pinning here is too late. jax.config
    # can still be updated until the first backend use, and XLA_FLAGS is
    # read at client creation — both still pending when conftest runs.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not RUN_ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; axon plugin won the platform race"
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def alanine_system():
    from pmarlo_tpu.data import alanine_dipeptide_structure
    from pmarlo_tpu.md.forcefield import build_system
    from pmarlo_tpu.md.topology import build_topology

    topo = build_topology(alanine_dipeptide_structure())
    system, positions = build_system(topo)
    return system, positions, topo


@pytest.fixture(scope="session")
def topology_info(alanine_system):
    from pmarlo_tpu.features.base import TopologyInfo

    _, _, topo = alanine_system
    return TopologyInfo(
        atom_names=topo.atom_names,
        residue_names=topo.residue_names,
        residue_ids=topo.residue_ids,
    )


@pytest.fixture(scope="session")
def double_well_dtrajs():
    """Synthetic double-well labels (the reference's synthetic-physics
    pattern, tests/integration/test_msm_synthetic.py)."""
    rng = np.random.default_rng(0)

    def simulate(n):
        x = np.zeros(n)
        for t in range(1, n):
            grad = 4 * x[t - 1] ** 3 - 4 * x[t - 1]
            x[t] = x[t - 1] - grad * 0.01 + np.sqrt(2 * 0.01) * rng.normal()
        return x

    xs = [simulate(5000) for _ in range(3)]
    edges = np.linspace(-1.6, 1.6, 11)
    dtrajs = [np.clip(np.digitize(x, edges) - 1, 0, 9) for x in xs]
    return dtrajs, xs
