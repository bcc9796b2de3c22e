"""Test harness: force CPU with 8 virtual devices BEFORE jax initializes.

The container's default JAX platform is the axon TPU tunnel
(JAX_PLATFORMS=axon); tests must run hermetically on the host CPU with a
virtual 8-device mesh so that multi-chip sharding paths compile and execute
without real chips.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# slow tier: the measured >=10 s tests (fuzz matrices, subprocess
# multihost, pipeline/attention integration).  Quick loop:
#   python -m pytest tests/ -q -m "not slow"     (~half the wall time)
# Full suite stays the default and the CI/driver invocation.
_SLOW_TESTS = {
    "test_fuzz_strip_planner_invariants",
    "test_fuzz_fused_geometry_and_slots",
    "test_fuzz_fused_vs_xla",
    "test_two_process_multihost_smoke",
    "test_model_pipeline_matches_single_device",
    "test_pipeline_parallel_matches_sequential_stack",
    "test_strip_attention_multiwindow_v",
    "test_strip_attention_matches_oracle",
    "test_fused_ngat_attention_matches_xla",
    "test_multiwindow_v_bf16_grouped",
    "test_multiwindow_v_strip_plans",
    "test_giant_graph_training",
    "test_dp_attention_plans_match_xla",
    "test_dp_tp_composition",
    "test_sparse_model_trains",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >=10 s integration/fuzz tests "
        "(deselect with -m 'not slow' for the quick loop)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
    yield


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
