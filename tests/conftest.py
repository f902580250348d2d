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

# NO persistent compile cache for the suite (round 4 reverted it after
# one round): XLA:CPU's AOT function registry is process-global and
# keyed by NON-UNIQUE fusion names ("compare_broadcast_fusion", ...) —
# mixing persistent-cache loads with serialize_executable deserializes
# (tests/test_aot.py, test_serve.py) in one process breaks whichever
# executable registers a colliding name second, as a nondeterministic
# "Function <fusion> not found" at dispatch (minimal repro: NOTES.md
# round 4). Per process it must be cache XOR deserialize; the suite
# deserializes, so it compiles fresh. runtime/aot.py enforces the same
# invariant for any non-test CPU process via _quarantine_compile_cache.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
