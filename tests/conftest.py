"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device sharding tests run on CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=8 (the TPU-sim facility
the reference has no equivalent of; see SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# This image pre-imports jax via sitecustomize with JAX_PLATFORMS=axon, so
# env vars alone don't stick — force the platform through jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeat suite runs load executables instead
# of re-invoking the XLA:CPU compiler — a large wall-time win on small
# hosts (the heavy real-dim vocoder/megakernel compiles dominate), and
# it sidesteps a rare XLA:CPU compiler segfault observed late in long
# single-process suite runs (backend_compile_and_load crashed at ~91%
# of a full run; every test passes standalone). Cache entries are keyed
# by jax version + config, so the dir is safe to keep across upgrades.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
