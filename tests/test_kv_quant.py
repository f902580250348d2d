"""int8 talker KV cache (models/stack.QuantKV).

Halving KV bytes is allowed by the reference's precision constraint —
bf16 binds the CODE PREDICTOR only (README.md:72); the talker itself runs
F16 GGML in the reference. These tests pin the quantization math and that
the end-to-end generation paths (lock-step, ring, admissions) stay within
tolerance of the bf16 cache.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import talker
from qwen3_tts_tpu.models.stack import QuantKV, init_kv_cache, quantize_kv_rows
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.ops.layers import gqa_attention_step_kvmajor
from qwen3_tts_tpu.runtime.generate import (
    admit_slots, generate_chunk, init_state, make_consts, required_ctx,
    required_ctx_ring)


def test_quantize_roundtrip_accuracy(rng):
    x = jnp.asarray(rng.standard_normal((4, 8, 128)) * 3.0, jnp.float32)
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    back = q.astype(jnp.float32) * s[..., None]
    err = np.max(np.abs(np.asarray(back - x)))
    amax = np.max(np.abs(np.asarray(x)))
    assert err <= amax / 127.0 + 1e-6  # within half-ulp-ish of absmax quant


def test_attention_int8_matches_bf16(rng):
    B, n_heads, n_kv, D, S = 4, 8, 4, 32, 64
    q = jnp.asarray(rng.standard_normal((B, n_heads, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, n_kv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, n_kv, S, D)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (B, S)), bool).at[:, 0].set(True)

    base = gqa_attention_step_kvmajor(q, k.astype(jnp.bfloat16),
                                      v.astype(jnp.bfloat16), mask)
    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    got = gqa_attention_step_kvmajor(q, kq, vq, mask, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=5e-2, rtol=5e-2)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(130), cfg)
    B = 4
    rng = np.random.default_rng(131)
    tokens = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)),
                         jnp.int32)
    lens = jnp.full((B,), 16, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    return cfg, w, prefill


def _gen(cfg, w, prefill, kv_quant, chunk=6):
    ctx = required_ctx(prefill.prefill_embd.shape[1], chunk, chunk)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                       kv_quant=kv_quant)
    consts = make_consts(prefill, 0.0, 1.05)
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, chunk,
                                         lockstep=True)
    return np.asarray(codes), np.asarray(valid), np.asarray(state.logits)


def test_generate_int8_close_to_bf16(setup):
    """Greedy generation with the int8 cache: logits stay within
    quantization tolerance and codes agree almost everywhere (argmax can
    legitimately flip on near-ties)."""
    cfg, w, prefill = setup
    codes_b, valid_b, logits_b = _gen(cfg, w, prefill, False)
    codes_q, valid_q, logits_q = _gen(cfg, w, prefill, True)
    assert codes_q.shape == codes_b.shape
    ref_mag = np.abs(logits_b).max()
    np.testing.assert_allclose(logits_q, logits_b, atol=0.06 * ref_mag)
    agree = (codes_q == codes_b).mean()
    assert agree > 0.9, f"code agreement {agree:.2%}"


def test_cache_is_actually_int8(setup):
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 4, 4)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                       kv_quant=True)
    assert isinstance(state.kv_cache, QuantKV)
    assert state.kv_cache.values.dtype == jnp.int8
    B, P = prefill.prefill_embd.shape[:2]
    assert state.kv_cache.values.shape == (
        cfg.n_layers, 2, B, cfg.n_key_value_heads, ctx, cfg.head_dim)
    assert state.kv_cache.scales.shape == (
        cfg.n_layers, 2, B, cfg.n_key_value_heads, ctx)
    # prefill actually wrote quantized rows (non-default scales)
    s = np.asarray(state.kv_cache.scales[:, :, :, :, :P])
    assert (s > 1e-6).mean() > 0.5


def test_serving_path_int8(setup):
    """Ring-mode serving primitives (admit + chunk + reuse) run with the
    int8 cache and produce valid frames close to the bf16 run."""
    cfg, w, prefill = setup
    B = prefill.prefill_embd.shape[0]
    chunk = 4
    ctx = required_ctx_ring(2 * chunk, chunk)

    def run(kv_quant):
        dummy = talker.build_prefill_inputs(
            w, cfg, jnp.zeros((B, 16), jnp.int32),
            jnp.full((B,), 16, jnp.int32),
            jnp.zeros((B, cfg.hidden_size), jnp.float32))
        state = init_state(w, cfg, dummy, ctx, jax.random.PRNGKey(0),
                           active=jnp.zeros((B,), bool), kv_quant=kv_quant)
        consts = make_consts(dummy, 0.0, 1.05)
        state, consts = admit_slots(w, cfg, state, consts,
                                    jnp.arange(B, dtype=jnp.int32), prefill)
        out = []
        for _ in range(2):
            state, codes, valid = generate_chunk(
                w, cfg, state, consts, 50, chunk, ring=True, read_ctx=ctx)
            out.append(np.asarray(codes))
        return np.concatenate(out)

    base = run(False)
    got = run(True)
    agree = (got == base).mean()
    assert agree > 0.9, f"ring-mode code agreement {agree:.2%}"


def test_pipeline_env_flag(monkeypatch):
    """QWEN3_TTS_KV=int8 routes the full pipeline through the quantized
    cache and still produces audio."""
    from qwen3_tts_tpu.models import vocoder as voc_mod
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from .test_tokenizer import make_tiny_tokenizer

    rng = np.random.default_rng(140)
    cfg = tiny_talker_config()
    w = init_talker_weights(rng, cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    engine = Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                      voc_cfg, voc_w)
    p = TTSParams(max_audio_tokens=6, temperature=0.0,
                  print_timing=False, seed=0)
    base = engine.synthesize("hello world.", p)
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    got = engine.synthesize("hello world.", p)
    assert got.success
    assert abs(got.n_frames - base.n_frames) <= 1
    assert len(got.audio) > 0
