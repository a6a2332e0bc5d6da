"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon TPU plugin ignores the JAX_PLATFORMS env var on this image; the
# config knob is authoritative. Tests must run on the 8-device virtual CPU.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: XLA compiles dominate test time on this 1-core
# machine; cache across pytest invocations.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Inner-loop tier: kernel/box/eval units, the torch importer, and one tiny
# e2e (forward parity) — ~2.5 min on this host with a warm compile cache.
# `pytest -m fast` runs these; the full suite (~21 min) is the default.
_FAST_MODULES = {
    "test_boxes", "test_anchors", "test_nms", "test_roi_align",
    "test_sg_eval", "test_sampling", "test_union_boxes", "test_analysis",
    "test_data", "test_highway_lstm", "test_det_map", "test_torch_import",
    "test_calibrate", "test_forward_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        tier = "fast" if item.module.__name__ in _FAST_MODULES else "slow"
        item.add_marker(getattr(pytest.mark, tier))


@pytest.fixture
def rng():
    return np.random.RandomState(0)
