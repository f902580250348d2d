"""Talker model tests: shapes, prefill/step cache equivalence, prefill
embedding recipe, batch-vs-single equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import talker
from qwen3_tts_tpu.models.stack import init_kv_cache
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(1), cfg)
    return cfg, w


def test_prefill_shapes(setup):
    cfg, w = setup
    B, P, S = 2, 10, 64
    x = jnp.asarray(np.random.default_rng(2).standard_normal((B, P, cfg.hidden_size)),
                    jnp.float32)
    cache = init_kv_cache(cfg.n_layers, B, S, cfg.n_key_value_heads, cfg.head_dim)
    h, logits, cache = talker.talker_prefill(w, cfg, x, cache)
    assert h.shape == (B, cfg.hidden_size)
    assert logits.shape == (B, cfg.codec_vocab_size)
    assert cache.shape == (cfg.n_layers, 2, B, cfg.n_key_value_heads, S, cfg.head_dim)
    # cache rows beyond P stay zero (kv-major layout: S is dim 4)
    assert jnp.all(cache[:, :, :, :, P:] == 0)


def test_step_matches_prefill(setup):
    """Prefill(T) must equal prefill(T-1) + step: same logits at the last
    position (jit-vs-eager + incremental-cache correctness in one check)."""
    cfg, w = setup
    B, T, S = 2, 6, 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.hidden_size)), jnp.float32)

    cache_full = init_kv_cache(cfg.n_layers, B, S, cfg.n_key_value_heads, cfg.head_dim)
    h_full, logits_full, _ = talker.talker_prefill(w, cfg, x, cache_full)

    cache_inc = init_kv_cache(cfg.n_layers, B, S, cfg.n_key_value_heads, cfg.head_dim)
    _, _, cache_inc = talker.talker_prefill(w, cfg, x[:, :T - 1], cache_inc)
    h_step, logits_step, _ = talker.talker_step(
        w, cfg, x[:, -1], cache_inc, jnp.int32(T - 1))

    np.testing.assert_allclose(np.asarray(h_step), np.asarray(h_full),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(logits_step), np.asarray(logits_full),
                               atol=2e-2, rtol=2e-2)


def test_batch_equals_single(setup):
    """Stream 0 of a B=3 batch must match a B=1 run (batched-serving
    correctness; no reference equivalent — it is single-stream)."""
    cfg, w = setup
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 5, cfg.hidden_size)), jnp.float32)
    cache3 = init_kv_cache(cfg.n_layers, 3, 16, cfg.n_key_value_heads, cfg.head_dim)
    h3, l3, _ = talker.talker_prefill(w, cfg, x, cache3)
    cache1 = init_kv_cache(cfg.n_layers, 1, 16, cfg.n_key_value_heads, cfg.head_dim)
    h1, l1, _ = talker.talker_prefill(w, cfg, x[:1], cache1)
    np.testing.assert_allclose(np.asarray(h3[0]), np.asarray(h1[0]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(l3[0]), np.asarray(l1[0]),
                               atol=1e-4, rtol=1e-3)


def test_prefill_inputs_recipe(setup):
    """Structural checks of the build_prefill_graph port
    (tts_transformer.cpp:1093-1231)."""
    cfg, w = setup
    B, n_tok = 2, 14  # 6 text tokens + 8 template tokens
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.text_vocab_size, (B, n_tok)),
        jnp.int32)
    token_len = jnp.array([n_tok, n_tok - 2], jnp.int32)
    speaker = jnp.zeros((B, cfg.hidden_size), jnp.float32)

    pi = talker.build_prefill_inputs(w, cfg, tokens, token_len, speaker)

    # think path: 4 prefix + 1 speaker + 2 tail = 7 codec rows
    # prefill_len = 3 role + 6 overlaid + 1 = 10
    assert pi.prefill_embd.shape == (B, 10, cfg.hidden_size)
    assert pi.trailing_hidden.shape[0] == B
    np.testing.assert_array_equal(np.asarray(pi.trailing_len),
                                  np.asarray(token_len) - 8)

    # Row 0..2 are the projected role prefix
    proj = talker.project_text_tokens(w, tokens[:, :3])
    np.testing.assert_allclose(np.asarray(pi.prefill_embd[:, :3]),
                               np.asarray(proj), atol=1e-5)

    # Row 3 = codec_embd[think_id] + tts_pad projection
    specials = jnp.array([cfg.tts_bos_token_id, cfg.tts_eos_token_id,
                          cfg.tts_pad_token_id], jnp.int32)
    sp = talker.project_text_tokens(w, specials)
    think_row = np.asarray(w["codec_embd"].astype(jnp.float32))[cfg.codec_think_id]
    expect3 = np.broadcast_to(think_row + np.asarray(sp[2]),
                              (B, cfg.hidden_size))
    np.testing.assert_allclose(np.asarray(pi.prefill_embd[:, 3]), expect3,
                               atol=1e-4)

    # Row 8 (codec_pad, last overlay row) gets tts_bos instead of tts_pad
    pad_row = np.asarray(w["codec_embd"].astype(jnp.float32))[cfg.codec_pad_id]
    expect8 = np.broadcast_to(pad_row + np.asarray(sp[0]),
                              (B, cfg.hidden_size))
    np.testing.assert_allclose(np.asarray(pi.prefill_embd[:, 8]), expect8,
                               atol=1e-4)

    # Last row = proj(tok[3]) + codec_embd[codec_bos]
    bos_row = np.asarray(w["codec_embd"].astype(jnp.float32))[cfg.codec_bos_id]
    proj3 = np.asarray(talker.project_text_tokens(w, tokens[:, 3]))
    np.testing.assert_allclose(np.asarray(pi.prefill_embd[:, 9]),
                               proj3 + bos_row[None], atol=1e-4)

    # Trailing row for stream 0 at index len-9 is the tts_eos projection
    eos_idx = n_tok - 9
    np.testing.assert_allclose(np.asarray(pi.trailing_hidden[0, eos_idx]),
                               np.asarray(sp[1]), atol=1e-5)
    # ... and before that, projected text tokens starting at index 4
    np.testing.assert_allclose(
        np.asarray(pi.trailing_hidden[0, 0]),
        np.asarray(talker.project_text_tokens(w, tokens[0, 4])), atol=1e-5)


def test_nothink_prefill_len(setup):
    cfg, w = setup
    tokens = jnp.zeros((1, 12), jnp.int32)
    pi = talker.build_prefill_inputs(
        w, cfg, tokens, jnp.array([12], jnp.int32),
        jnp.zeros((1, cfg.hidden_size), jnp.float32), use_think=False)
    # nothink: 3 prefix + 1 speaker + 2 tail = 6 codec rows -> prefill 9
    assert pi.prefill_embd.shape[1] == 9


def test_forward_text_api(setup):
    """forward_text = project + optional speaker add + prefill
    (tts_transformer.cpp:1922-1950)."""
    cfg, w = setup
    B, T = 2, 5
    tokens = jnp.asarray(np.random.default_rng(6).integers(
        0, cfg.text_vocab_size, (B, T)), jnp.int32)
    spk = jnp.asarray(np.random.default_rng(7).standard_normal(
        (B, cfg.hidden_size)) * 0.1, jnp.float32)
    cache = init_kv_cache(cfg.n_layers, B, 16, cfg.n_key_value_heads,
                          cfg.head_dim)
    h, logits, _ = talker.forward_text(w, cfg, tokens, spk, cache)
    # equivalent manual composition
    x = talker.project_text_tokens(w, tokens) + spk[:, None, :]
    cache2 = init_kv_cache(cfg.n_layers, B, 16, cfg.n_key_value_heads,
                           cfg.head_dim)
    h2, logits2, _ = talker.talker_prefill(w, cfg, x, cache2)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5)
    # without speaker embedding
    h3, _, _ = talker.forward_text(w, cfg, tokens, None, cache)
    assert not np.allclose(np.asarray(h3), np.asarray(h))


def test_empty_text_trailing_row_is_eos():
    """The 8-token empty-text template must still schedule tts_eos as
    trailing row 0 (trailing_token_count = max(0, n-9),
    tts_transformer.cpp:1214-1228) — eos_pos = n-9 = -1 never matched."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.talker import (build_prefill_inputs,
                                             project_text_tokens)
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(61), cfg)
    B, T = 1, 16
    tokens = jnp.zeros((B, T), jnp.int32)
    pf = build_prefill_inputs(w, cfg, tokens, jnp.full((B,), 8, jnp.int32),
                              jnp.zeros((B, cfg.hidden_size), jnp.float32))
    eos_row = np.asarray(project_text_tokens(
        w, jnp.asarray([cfg.tts_eos_token_id], jnp.int32))[0])
    assert int(pf.trailing_len[0]) == 1
    np.testing.assert_allclose(np.asarray(pf.trailing_hidden[0, 0]),
                               eos_row, rtol=1e-5, atol=1e-5)
