"""AOT executable cache (runtime/aot.py)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.runtime.aot import AotCache


def test_roundtrip_and_reload(tmp_path):
    cache = AotCache(tmp_path, enabled=True)
    f = jax.jit(lambda x, y: x * 2 + y, static_argnames=())
    x = jnp.arange(8, dtype=jnp.float32)

    fn = cache.get_or_compile("double", f, x, x)
    np.testing.assert_array_equal(np.asarray(fn(x, x)), np.asarray(x * 3))
    files = list(tmp_path.glob("double-*.jaxexec"))
    assert len(files) == 1

    # second cache instance loads the artifact (no compile)
    cache2 = AotCache(tmp_path, enabled=True)
    fn2 = cache2.load("double")
    assert fn2 is not None
    np.testing.assert_array_equal(np.asarray(fn2(x, x)), np.asarray(x * 3))


def test_static_args_baked(tmp_path):
    from functools import partial
    cache = AotCache(tmp_path, enabled=True)
    f = jax.jit(lambda x, k: x * k, static_argnames=("k",))
    x = jnp.ones((4,))
    fn = cache.get_or_compile("scale3", f, x, k=3)
    # dynamic args only at call time
    np.testing.assert_array_equal(np.asarray(fn(x)), np.full(4, 3.0))


def test_corrupt_artifact_falls_back(tmp_path):
    cache = AotCache(tmp_path, enabled=True)
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((4,))
    cache.get_or_compile("inc", f, x)
    path = next(tmp_path.glob("inc-*.jaxexec"))
    path.write_bytes(b"garbage")
    assert cache.load("inc") is None          # falls back, removes artifact
    assert not path.exists()
    fn = cache.get_or_compile("inc", f, x)    # recompiles + re-saves
    np.testing.assert_array_equal(np.asarray(fn(x)), np.ones(4))


def test_disabled_cache_compiles_without_artifacts(tmp_path):
    cache = AotCache(tmp_path, enabled=False)
    f = jax.jit(lambda x: x - 1)
    x = jnp.zeros((4,))
    fn = cache.get_or_compile("dec", f, x)
    np.testing.assert_array_equal(np.asarray(fn(x)), np.full(4, -1.0))
    assert not list(tmp_path.glob("*.jaxexec"))
