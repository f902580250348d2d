"""Code predictor tests: fused-scan vs step-by-step reference equivalence,
greedy determinism, batch consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import code_predictor
from qwen3_tts_tpu.models.stack import (
    init_kv_cache, stack_prefill, stack_step, write_prefill_to_cache)
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.ops.layers import rms_norm


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(7), cfg)
    return cfg, w


def reference_predict_greedy(w, cfg, hidden, cb0):
    """Unfused step-by-step reimplementation mirroring the reference's
    per-step graph rebuild flow (tts_transformer.cpp:2185-2340), used as
    a cross-check for the fused scan."""
    cp = w["code_pred"]
    B = hidden.shape[0]
    kw = dict(n_heads=cfg.code_pred_n_attention_heads,
              n_kv=cfg.code_pred_n_kv_heads,
              head_dim=cfg.code_pred_head_dim,
              eps=cfg.rms_norm_eps, theta=cfg.rope_theta)

    codec_embd = w["codec_embd"].astype(jnp.float32)
    x0 = hidden.astype(jnp.float32)
    x1 = jnp.take(codec_embd, cb0, axis=0)
    xs = jnp.stack([x0, x1], axis=1)
    positions = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None], (B, 2))
    y, ks, vs = stack_prefill(cp["layers"], xs, positions, **kw)
    cache = init_kv_cache(cfg.code_pred_layers, B, 16,
                          cfg.code_pred_n_kv_heads, cfg.code_pred_head_dim)
    cache = write_prefill_to_cache(cache, ks, vs, 0)
    h = rms_norm(y[:, -1], cp["output_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(h.astype(cp["heads"].dtype), cp["heads"][0],
                     preferred_element_type=jnp.float32)
    codes = [jnp.argmax(logits, axis=-1).astype(jnp.int32)]

    for step in range(1, cfg.n_codebooks - 1):
        n_past = step + 1
        x = jnp.take(cp["embd"][step - 1].astype(jnp.float32),
                     codes[-1], axis=0)
        pos = jnp.full((B,), n_past, jnp.int32)
        n_valid = jnp.full((B,), n_past + 1, jnp.int32)
        y, cache = stack_step(cp["layers"], x, pos, cache,
                              jnp.int32(n_past), n_valid, **kw)
        h = rms_norm(y, cp["output_norm"], cfg.rms_norm_eps)
        logits = jnp.dot(h.astype(cp["heads"].dtype), cp["heads"][step],
                         preferred_element_type=jnp.float32)
        codes.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return jnp.stack(codes, axis=1)


def test_fused_scan_matches_stepwise(setup):
    cfg, w = setup
    B = 2
    rng = np.random.default_rng(8)
    hidden = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)), jnp.float32)
    cb0 = jnp.asarray(rng.integers(0, 2048, (B,)), jnp.int32)
    key = jax.random.PRNGKey(0)

    fused = code_predictor.predict_codes(
        w, cfg, hidden, cb0, jnp.float32(0.0), 50, key)
    ref = reference_predict_greedy(w, cfg, hidden, cb0)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))
    assert fused.shape == (B, cfg.n_codebooks - 1)
    assert np.all(np.asarray(fused) >= 0)
    assert np.all(np.asarray(fused) < cfg.code_pred_vocab_size)


def test_greedy_deterministic(setup):
    cfg, w = setup
    rng = np.random.default_rng(9)
    hidden = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)), jnp.float32)
    cb0 = jnp.array([5], jnp.int32)
    a = code_predictor.predict_codes(w, cfg, hidden, cb0, jnp.float32(0.0), 50,
                                     jax.random.PRNGKey(0))
    b = code_predictor.predict_codes(w, cfg, hidden, cb0, jnp.float32(0.0), 50,
                                     jax.random.PRNGKey(123))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampled_within_vocab_and_seeded(setup):
    cfg, w = setup
    rng = np.random.default_rng(10)
    hidden = jnp.asarray(rng.standard_normal((2, cfg.hidden_size)), jnp.float32)
    cb0 = jnp.array([1, 2], jnp.int32)
    a = code_predictor.predict_codes(w, cfg, hidden, cb0, jnp.float32(0.9), 50,
                                     jax.random.PRNGKey(42))
    b = code_predictor.predict_codes(w, cfg, hidden, cb0, jnp.float32(0.9), 50,
                                     jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.asarray(a) < cfg.code_pred_vocab_size)


def test_frame_step_embedding(setup):
    cfg, w = setup
    B = 2
    codes = jnp.asarray(np.random.default_rng(11).integers(
        0, 256, (B, cfg.n_codebooks)), jnp.int32)
    trailing = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    emb = code_predictor.frame_step_embedding(w, cfg, codes, trailing)
    # manual: codec_embd[cb0] + sum over code_pred embds
    ce = np.asarray(w["codec_embd"].astype(jnp.float32))
    cpe = np.asarray(w["code_pred"]["embd"].astype(jnp.float32))
    for b in range(B):
        expect = ce[int(codes[b, 0])].copy()
        for cb in range(1, cfg.n_codebooks):
            expect += cpe[cb - 1][int(codes[b, cb])]
        np.testing.assert_allclose(np.asarray(emb[b]), expect, atol=1e-4)
