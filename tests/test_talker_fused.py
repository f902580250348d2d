"""Parity tests for the talker decode-step megakernel
(ops/talker_fused.py) against the XLA stack_step, in Pallas interpret
mode (CPU). Compiled-Mosaic parity on the real chip is asserted by
tools/r4_measure.sh (bench_talker_fused --parity).

The tiny geometry keeps the kernel's structural requirements
(NKV*D == H, NH == 2*NKV, I == 3*H — the reference talker's ratios,
tts_transformer.h:21-35) at interpret-tractable sizes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from qwen3_tts_tpu.models import stack
from qwen3_tts_tpu.models.stack import QuantKV, init_kv_cache, stack_step
from qwen3_tts_tpu.ops import talker_fused

H, NH, NKV, D, I = 128, 8, 4, 32, 384
EPS, THETA = 1e-6, 1e6


class _Cfg:
    hidden_size = H
    n_attention_heads = NH
    n_key_value_heads = NKV
    head_dim = D
    intermediate_size = I


def _layers(L, rng):
    def rn(*shape, scale=0.08):
        return jnp.asarray(rng.standard_normal(shape) * scale,
                           jnp.bfloat16)

    return {
        "wqkv": rn(L, H, 4 * H),
        "wo": rn(L, 2 * H, H),
        "w_gu": rn(L, H, 6 * H),
        "w_down": rn(L, 3 * H, H),
        "attn_norm": jnp.asarray(1.0 + 0.1 * rng.standard_normal((L, H)),
                                 jnp.float32),
        "ffn_norm": jnp.asarray(1.0 + 0.1 * rng.standard_normal((L, H)),
                                jnp.float32),
        "q_norm": jnp.asarray(1.0 + 0.1 * rng.standard_normal((L, D)),
                              jnp.float32),
        "k_norm": jnp.asarray(1.0 + 0.1 * rng.standard_normal((L, D)),
                              jnp.float32),
    }


def _random_cache(L, B, S, quant, rng):
    """Random-but-plausible cache content: both paths read identical
    rows, so parity needs no semantic consistency."""
    cache = init_kv_cache(L, B, S, NKV, D, quant=quant)
    vals = jnp.asarray(rng.standard_normal((L, 2, B, NKV, S, D)) * 0.5,
                       jnp.float32)
    if quant:
        q, s = stack.quantize_kv_rows(vals)
        return QuantKV(values=q, scales=s)
    return vals.astype(jnp.bfloat16)


def _run_both(L=2, B=4, S=256, read_ctx=256, quant=False, seed=0,
              frozen=()):
    rng = np.random.default_rng(seed)
    lw = _layers(L, rng)
    cache = _random_cache(L, B, S, quant, rng)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)

    widx = 130                     # past the first seq block
    n_past = np.full((B,), widx, np.int64)
    for b, np_b in frozen:
        n_past[b] = np_b           # frozen streams sit below widx
    positions = jnp.asarray(n_past, jnp.int32)
    n_valid = positions + 1
    kw = dict(n_heads=NH, n_kv=NKV, head_dim=D, eps=EPS, theta=THETA,
              read_ctx=read_ctx)

    y_ref, cache_ref = stack_step(
        lw, x, positions, cache, jnp.int32(widx), n_valid, **kw)
    y_fus, cache_fus = talker_fused.talker_step_fused(
        lw, x, positions, cache, jnp.int32(widx), n_valid,
        interpret=True, **kw)
    return (y_ref, cache_ref), (y_fus, cache_fus), widx


def _cache_parts(c):
    return (c.values, c.scales) if isinstance(c, QuantKV) else (c,)


@pytest.mark.parametrize("quant", [False, True])
def test_step_parity(quant):
    (y_ref, c_ref), (y_fus, c_fus), widx = _run_both(quant=quant)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=3e-2, rtol=3e-2)
    for a, b in zip(_cache_parts(c_ref), _cache_parts(c_fus)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # untouched rows bit-identical
        mask = np.ones(a.shape[4 if a.ndim == 6 else 4], bool)
        mask[widx] = False
        np.testing.assert_array_equal(a[:, :, :, :, mask],
                                      b[:, :, :, :, mask])
    # the written row matches within bf16 matmul wiggle; for int8 compare
    # DEQUANTIZED rows (deeper layers see bf16-LSB input differences that
    # can flip a quantization boundary by one int8 step)
    if isinstance(c_ref, QuantKV):
        row_r = (np.asarray(c_ref.values[..., widx, :], np.float32)
                 * np.asarray(c_ref.scales[..., widx])[..., None])
        row_f = (np.asarray(c_fus.values[..., widx, :], np.float32)
                 * np.asarray(c_fus.scales[..., widx])[..., None])
    else:
        row_r = np.asarray(c_ref[..., widx, :], np.float32)
        row_f = np.asarray(c_fus[..., widx, :], np.float32)
    np.testing.assert_allclose(row_f, row_r, atol=4e-2, rtol=5e-2)


def test_step_parity_frozen_streams():
    """Streams frozen below the write slot (done lanes in lock-step)
    still decode identically: their current-row term is masked."""
    (y_ref, _), (y_fus, _), _ = _run_both(
        B=4, frozen=[(1, 64), (3, 7)], seed=3)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=3e-2, rtol=3e-2)


def test_step_parity_multi_tile_multi_block():
    """B=64 -> two 32-wide stream tiles; read_ctx 256 -> two seq blocks;
    three layers exercises the cross-layer DMA wrap."""
    (y_ref, _), (y_fus, _), _ = _run_both(
        L=3, B=64, S=384, read_ctx=256, quant=True, seed=5)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("quant", [False, True])
def test_step_parity_masked_ring(quant):
    """Ring-slot bitmask mode (serving): scattered validity, shared
    scalar write slot, dead lanes with a cleared current bit."""
    rng = np.random.default_rng(21)
    L, B, S = 2, 4, 256
    lw = _layers(L, rng)
    cache = _random_cache(L, B, S, quant, rng)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    widx = 170
    # scattered ring validity; every lane keeps >=1 valid slot
    mask = rng.random((B, S)) < 0.4
    mask[:, 0] = True
    mask[:, widx + 1:] = False
    mask[:, widx] = [True, False, True, True]    # lane 1 = dead this step
    mask_j = jnp.asarray(mask)
    positions = jnp.asarray([200, 40, 7, 130], jnp.int32)  # logical pos
    n_valid = positions + 1                       # ignored in mask mode
    kw = dict(n_heads=NH, n_kv=NKV, head_dim=D, eps=EPS, theta=THETA,
              read_ctx=256)
    y_ref, c_ref = stack_step(lw, x, positions, cache, jnp.int32(widx),
                              n_valid, valid_mask=mask_j, **kw)
    y_fus, c_fus = talker_fused.talker_step_fused(
        lw, x, positions, cache, jnp.int32(widx), n_valid,
        valid_mask=mask_j, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=3e-2, rtol=3e-2)
    for a, b in zip(_cache_parts(c_ref), _cache_parts(c_fus)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        keep = np.ones(S, bool)
        keep[widx] = False
        np.testing.assert_array_equal(a[:, :, :, :, keep],
                                      b[:, :, :, :, keep])


def test_read_ctx_bounds_reads():
    """Slots at/above read_ctx must never contribute: poison them."""
    rng = np.random.default_rng(11)
    L, B, S, rc = 2, 4, 384, 256
    lw = _layers(L, rng)
    cache = np.asarray(_random_cache(L, B, S, False, rng), np.float32)
    cache[:, :, :, :, rc:, :] = np.nan        # poison beyond the window
    cache = jnp.asarray(cache, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    positions = jnp.full((B,), 130, jnp.int32)
    y, _ = talker_fused.talker_step_fused(
        lw, x, positions, cache, jnp.int32(130), positions + 1,
        n_heads=NH, n_kv=NKV, head_dim=D, eps=EPS, theta=THETA,
        read_ctx=rc, interpret=True)
    assert np.isfinite(np.asarray(y)).all()


def test_dispatch_via_talker_step():
    """QWEN3_TTS_TALKER=fused_interpret routes talker_step through the
    kernel and matches the XLA path end-to-end (output norm + head)."""
    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models import talker

    cfg = TalkerConfig(
        hidden_size=H, n_layers=2, n_attention_heads=NH,
        n_key_value_heads=NKV, intermediate_size=I, head_dim=D,
        codec_vocab_size=64, rms_norm_eps=EPS, rope_theta=THETA)
    rng = np.random.default_rng(7)
    B, S = 4, 256
    w = {
        "layers": _layers(2, rng),
        "output_norm": jnp.ones((H,), jnp.float32),
        "codec_head": jnp.asarray(rng.standard_normal((H, 64)) * 0.1,
                                  jnp.bfloat16),
    }
    cache = _random_cache(2, B, S, False, rng)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    n_past = jnp.full((B,), 130, jnp.int32)

    talker.set_talker_step_impl("xla")
    try:
        h0, lg0, _ = talker.talker_step(w, cfg, x, cache, n_past,
                                        read_ctx=S, write_idx=jnp.int32(130))
        talker.set_talker_step_impl("fused_interpret")
        h1, lg1, _ = talker.talker_step(w, cfg, x, cache, n_past,
                                        read_ctx=S, write_idx=jnp.int32(130))
    finally:
        talker.set_talker_step_impl(None)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg0),
                               atol=3e-2, rtol=3e-2)


def test_generate_chunk_e2e_fused():
    """Lock-step generate_chunk with the fused kernel inside the scan:
    catches donation/aliasing-through-scan integration issues the
    step-level tests cannot (state.kv_cache is a donated scan carry the
    pallas_call aliases in place)."""
    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models import talker
    from qwen3_tts_tpu.models.weights import init_talker_weights_fast
    from qwen3_tts_tpu.runtime.generate import (generate_chunk, init_state,
                                                make_consts)

    cfg = TalkerConfig(
        text_vocab_size=64, text_embd_dim=32,
        hidden_size=H, n_layers=2, n_attention_heads=NH,
        n_key_value_heads=NKV, intermediate_size=I, head_dim=D,
        codec_vocab_size=3072, code_pred_layers=2,
        code_pred_vocab_size=64, code_pred_hidden_size=H,
        code_pred_intermediate_size=I, code_pred_n_attention_heads=NH,
        code_pred_n_kv_heads=NKV, code_pred_head_dim=D,
        rms_norm_eps=EPS, rope_theta=THETA)
    w = init_talker_weights_fast(0, cfg)
    rng = np.random.default_rng(0)
    B = 4
    tokens = jnp.asarray(rng.integers(0, 64, (B, 8)), jnp.int32)
    lens = jnp.full((B,), 8, jnp.int32)
    spk = jnp.zeros((B, H), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    consts = make_consts(prefill, 0.0, 1.0)

    def run():
        state = init_state(w, cfg, prefill, 128, jax.random.PRNGKey(3))
        st, codes, valid = generate_chunk(
            w, cfg, state, consts, 50, chunk_frames=4, greedy=True,
            read_ctx=128, lockstep=True)
        return np.asarray(codes), np.asarray(valid)

    talker.set_talker_step_impl("xla")
    try:
        codes0, valid0 = run()
        talker.set_talker_step_impl("fused_interpret")
        codes1, valid1 = run()
    finally:
        talker.set_talker_step_impl(None)
    # greedy decoding: identical code streams unless a logit sits within
    # bf16 wiggle of the argmax boundary — require exact here (tiny
    # random weights keep logits well-separated at this scale)
    np.testing.assert_array_equal(valid1, valid0)
    np.testing.assert_array_equal(codes1, codes0)


def test_auto_gating_multi_device(monkeypatch):
    """With _AUTO_FUSED on, 'auto' must take the XLA path whenever more
    than one device is visible (Mosaic kernels are not
    auto-partitionable under GSPMD — ADVICE r3's codepred finding,
    pre-wired here for the eventual default flip)."""
    from qwen3_tts_tpu.models import talker
    from qwen3_tts_tpu.ops import talker_fused

    calls = []
    monkeypatch.setattr(talker, "_AUTO_FUSED", True)
    monkeypatch.setattr(talker_fused, "talker_step_fused",
                        lambda *a, **k: calls.append(1) or (_ for _ in ()
                                                            ).throw(
                                                                RuntimeError))
    monkeypatch.setattr(jax, "device_count", lambda: 8)

    from qwen3_tts_tpu.config import TalkerConfig
    cfg = TalkerConfig(
        hidden_size=H, n_layers=2, n_attention_heads=NH,
        n_key_value_heads=NKV, intermediate_size=I, head_dim=D,
        codec_vocab_size=64, rms_norm_eps=EPS, rope_theta=THETA)
    rng = np.random.default_rng(7)
    B, S = 4, 256
    w = {
        "layers": _layers(2, rng),
        "output_norm": jnp.ones((H,), jnp.float32),
        "codec_head": jnp.asarray(rng.standard_normal((H, 64)) * 0.1,
                                  jnp.bfloat16),
    }
    cache = _random_cache(2, B, S, False, rng)
    x = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    n_past = jnp.full((B,), 130, jnp.int32)
    talker.set_talker_step_impl("auto")
    try:
        h, lg, _ = talker.talker_step(w, cfg, x, cache, n_past,
                                      read_ctx=S, write_idx=jnp.int32(130))
    finally:
        talker.set_talker_step_impl(None)
    assert not calls, "auto must not trace the kernel on a multi-device mesh"
    assert np.isfinite(np.asarray(h)).all()


def test_supported_gating():
    """Fallback preconditions: layered cache, bitmask mode, per-stream
    write slots, f32 weights and ragged read_ctx all reject."""
    rng = np.random.default_rng(0)
    lw = _layers(2, rng)
    w = {"layers": lw}
    cfg = _Cfg()
    B, S = 4, 256
    cache = _random_cache(2, B, S, False, rng)
    scalar = jnp.int32(10)
    ok = talker_fused.supported(cfg, B, w, cache, scalar, None, 128)
    assert ok
    layered = init_kv_cache(2, B, S, NKV, D, layered=True)
    assert not talker_fused.supported(cfg, B, w, layered, scalar, None, 128)
    mask = jnp.ones((B, S), bool)
    assert talker_fused.supported(cfg, B, w, cache, scalar, mask, 128)
    bad_mask = jnp.ones((B, S // 2), bool)    # mask/cache length mismatch
    assert not talker_fused.supported(cfg, B, w, cache, scalar, bad_mask,
                                      128)
    per_stream = jnp.full((B,), 10, jnp.int32)
    assert not talker_fused.supported(cfg, B, w, cache, per_stream, None, 128)
    f32w = dict(lw, wqkv=lw["wqkv"].astype(jnp.float32))
    assert not talker_fused.supported(cfg, B, {"layers": f32w}, cache,
                                      scalar, None, 128)
    assert not talker_fused.supported(cfg, B, w, cache, scalar, None, 100)
