"""Benchmark weight-init paths: the fast_fill hash generator and the
on-device init builders (models/weights.py, models/vocoder.py).

These exist because the axon tunnel made both host-side init (1.4 GB
upload at ~1.3 MB/s) and the threefry on-device program (23 MiB
executable, 60-530 s first dispatch) unusable for benches — NOTES.md
round 5. The contract: identical tree structure/shapes/dtypes to the
host init, bounded non-degenerate values with the requested variance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import vocoder
from qwen3_tts_tpu.models.weights import (fast_fill,
                                          init_talker_weights_device,
                                          tiny_talker_config)


def test_fast_fill_shape_dtype_bounds():
    scale = 0.02
    x = jax.jit(lambda: fast_fill((64, 128), 3, scale, jnp.float32))()
    assert x.shape == (64, 128) and x.dtype == jnp.float32
    a = np.asarray(x)
    lim = scale * np.sqrt(3.0) + 1e-6
    assert np.abs(a).max() <= lim                       # bounded
    # variance of uniform(-lim, lim) is scale^2; 8192 samples -> ~3% se
    assert abs(a.std() / scale - 1.0) < 0.1
    assert abs(a.mean()) < scale * 0.1                  # centered


def test_fast_fill_deterministic_and_seed_decorrelated():
    f = jax.jit(lambda s: fast_fill((32, 64), s, 0.1, jnp.float32),
                static_argnums=0)
    a, a2, b = (np.asarray(f(1)), np.asarray(f(1)), np.asarray(f(2)))
    np.testing.assert_array_equal(a, a2)                # deterministic
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert abs(corr) < 0.05                             # decorrelated
    # and not a constant / degenerate fill
    assert len(np.unique(a)) > a.size // 2


def test_talker_device_init_matches_host_structure():
    cfg = tiny_talker_config()
    host = init_talker_weights_device(jax.random.PRNGKey(0), cfg,
                                      fast=False)
    fast = init_talker_weights_device(jax.random.PRNGKey(0), cfg,
                                      fast=True)
    ph, pf = jax.tree.structure(host), jax.tree.structure(fast)
    assert ph == pf
    for lh, lf in zip(jax.tree.leaves(host), jax.tree.leaves(fast)):
        assert lh.shape == lf.shape and lh.dtype == lf.dtype
    # fast fill is real data, not zeros
    w = np.asarray(fast["codec_head"], np.float32)
    assert w.std() > 0.001


def test_vocoder_device_init_matches_host_structure():
    cfg = vocoder.tiny_vocoder_config()
    host = vocoder.cast_weights(
        vocoder.init_vocoder_weights(np.random.default_rng(1), cfg))
    dev = vocoder.init_vocoder_weights_device(cfg)
    assert jax.tree.structure(host) == jax.tree.structure(dev)
    for lh, ld in zip(jax.tree.leaves(host), jax.tree.leaves(dev)):
        assert lh.shape == ld.shape and lh.dtype == ld.dtype


def test_vocoder_device_init_decodes():
    """The device-built weights must actually run through the decoder
    (catches a degenerate fill that NaNs the snake/norm paths)."""
    cfg = vocoder.tiny_vocoder_config()
    w = vocoder.init_vocoder_weights_device(cfg)
    codes = jnp.zeros((1, 4, cfg.n_codebooks), jnp.int32)
    pcm = vocoder.vocoder_decode(w, cfg, codes)
    assert np.isfinite(np.asarray(pcm)).all()
