"""Fused code-predictor megakernel (ops/codepred_fused.py) parity tests.

The ground truth is a transparent jnp replica of the kernel's exact
semantics (16 uniform single-token steps, f32 attention, bf16 matmul
inputs, threshold top-k + Gumbel-argmax sampling). The kernel runs in
interpret mode on CPU; compiled-Mosaic parity on real hardware is
checked by tools/bench_codepred.py --parity.

vs the XLA path (models/code_predictor.predict_codes): the kernel's
attention keeps probs in f32 where the XLA path rounds them to bf16, so
argmax can legitimately flip on near-ties with random weights — exact
equality is asserted against the replica, distribution-level agreement
against the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.config import TalkerConfig
from qwen3_tts_tpu.models import code_predictor
from qwen3_tts_tpu.models.weights import init_talker_weights_fast
from qwen3_tts_tpu.ops import codepred_fused as cf
from qwen3_tts_tpu.ops.sampling import apply_top_k

CFG = TalkerConfig()
B = 8


@pytest.fixture(scope="module")
def weights():
    return init_talker_weights_fast(0, CFG)


@pytest.fixture(scope="module")
def inputs():
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, CFG.hidden_size),
                               jnp.float32) * 0.5
    cb0 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0,
                             CFG.code_pred_vocab_size)
    return hidden, cb0


def _replica(w, cfg, hidden, cb0, *, greedy, temperature=0.9, top_k=50,
             gumbel=None):
    """jnp mirror of the kernel: same step structure, same numerics."""
    cp = w["code_pred"]
    lw = cp["layers"]
    eps = cfg.rms_norm_eps
    L = cfg.code_pred_layers
    Bn = hidden.shape[0]
    NH, NKV, D, CTX = 16, 8, 128, 16
    rope_c, rope_s = cf._rope_tables(cfg.rope_theta)

    def rms(x, wr):
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + eps) * wr

    Kc = jnp.zeros((L, CTX, Bn, NKV, D), jnp.float32)
    Vc = jnp.zeros((L, CTX, Bn, NKV, D), jnp.float32)
    codes = []
    code = jnp.zeros((Bn,), jnp.int32)
    for p in range(CTX):
        if p == 0:
            x = hidden.astype(jnp.float32)
        elif p == 1:
            x = jnp.take(w["codec_embd"], cb0, axis=0).astype(jnp.float32)
        else:
            x = jnp.take(cp["embd"][p - 2], code, axis=0).astype(jnp.float32)
        c_row, s_row = rope_c[p], rope_s[p]
        for l in range(L):
            wl = jax.tree.map(lambda a: a[l], lw)
            xn = rms(x, wl["attn_norm"].astype(jnp.float32)).astype(
                jnp.bfloat16)
            qkv = jnp.dot(xn, wl["wqkv"], preferred_element_type=jnp.float32)
            q = rms(qkv[:, :2048].reshape(Bn, NH, D),
                    wl["q_norm"].astype(jnp.float32))
            k = rms(qkv[:, 2048:3072].reshape(Bn, NKV, D),
                    wl["k_norm"].astype(jnp.float32))
            v = qkv[:, 3072:].reshape(Bn, NKV, D)

            def rope(x3):
                half = jnp.concatenate([x3[..., 64:], x3[..., :64]], axis=-1)
                return x3 * c_row + half * s_row

            q, k = rope(q), rope(k)
            Kc = Kc.at[l, p].set(k.astype(jnp.bfloat16).astype(jnp.float32))
            Vc = Vc.at[l, p].set(v.astype(jnp.bfloat16).astype(jnp.float32))
            qs = q * (D ** -0.5)
            krep = jnp.repeat(Kc[l, :p + 1], 2, axis=2)
            sc = jnp.einsum("bhd,sbhd->bhs", qs, krep)
            e = jnp.exp(sc - sc.max(-1, keepdims=True))
            vrep = jnp.repeat(Vc[l, :p + 1], 2, axis=2)
            attn = jnp.einsum("bhs,sbhd->bhd", e / e.sum(-1, keepdims=True),
                              vrep).astype(jnp.bfloat16)
            x = x + jnp.dot(attn.reshape(Bn, 2048), wl["wo"],
                            preferred_element_type=jnp.float32)
            hn = rms(x, wl["ffn_norm"].astype(jnp.float32)).astype(
                jnp.bfloat16)
            gu = jnp.dot(hn, wl["w_gu"], preferred_element_type=jnp.float32)
            act = (jax.nn.silu(gu[:, :3072]) * gu[:, 3072:]).astype(
                jnp.bfloat16)
            x = x + jnp.dot(act, wl["w_down"],
                            preferred_element_type=jnp.float32)
        h = rms(x, cp["output_norm"].astype(jnp.float32)).astype(jnp.bfloat16)
        he = min(max(p - 1, 0), 14)
        logits = jnp.dot(h, cp["heads"][he],
                         preferred_element_type=jnp.float32)
        if greedy:
            code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            # multiply (not divide) to match the kernel's rounding exactly
            z = logits * (1.0 / jnp.maximum(jnp.float32(temperature), 1e-6))
            zm = apply_top_k(z, top_k)
            code = jnp.argmax(zm + gumbel[he], axis=-1).astype(jnp.int32)
        codes.append(code)
    return jnp.stack(codes[1:], axis=1)


def test_greedy_matches_replica(weights, inputs):
    hidden, cb0 = inputs
    ref = _replica(weights, CFG, hidden, cb0, greedy=True)
    got = cf.predict_codes_fused(weights, CFG, hidden, cb0,
                                 jnp.float32(0.9), 50, jax.random.PRNGKey(3),
                                 greedy=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _call_kernel_direct(w, cfg, hidden, cb0, gumbel, *, temperature=0.8,
                        top_k=50, greedy=False):
    """Invoke the kernel with an EXPLICIT gumbel array (test hook)."""
    cp = w["code_pred"]
    lw = cp["layers"]
    wqkv_p, wo_p = cf._permute_gqa_weights(lw["wqkv"], lw["wo"])
    L = wqkv_p.shape[0]
    H, TILE, CTX = cf.H, cf.TILE, cf.CTX
    wqkv_t = wqkv_p.reshape(L, H, 4, TILE).transpose(0, 2, 1, 3)
    wgu_t = lw["w_gu"].reshape(L, H, 6, TILE).transpose(0, 2, 1, 3)
    heads_t = cp["heads"].astype(jnp.bfloat16).reshape(
        CTX - 1, H, 2, TILE).transpose(0, 2, 1, 3)
    rope_c, rope_s = cf._rope_tables(cfg.rope_theta)
    xs = jnp.stack([hidden.astype(jnp.float32),
                    jnp.take(w["codec_embd"], cb0, axis=0)
                    .astype(jnp.float32)], 0)
    tinv = jnp.float32(1.0 / max(temperature, 1e-6)).reshape(1, 1)
    tle0 = jnp.full((1, 1), int(temperature <= 0), jnp.int32)
    call = cf._build_call(hidden.shape[0], cfg.code_pred_layers,
                          float(cfg.rms_norm_eps), greedy, top_k, True)
    out = call(xs, wqkv_t, wo_p, wgu_t, lw["w_down"], heads_t,
               cp["embd"].astype(jnp.bfloat16),
               lw["attn_norm"].astype(jnp.float32),
               lw["ffn_norm"].astype(jnp.float32),
               lw["q_norm"].astype(jnp.float32),
               lw["k_norm"].astype(jnp.float32),
               cp["output_norm"].astype(jnp.float32).reshape(1, H),
               rope_c, rope_s, gumbel, tinv, tle0)
    return out[:, 1:]


def test_sampled_zero_gumbel_equals_greedy(weights, inputs):
    """gumbel == 0 collapses the sampled path to argmax over the top-k
    mask, whose top-1 always survives — must equal greedy exactly."""
    hidden, cb0 = inputs
    zero_g = jnp.zeros((15, B, CFG.code_pred_vocab_size), jnp.float32)
    sampled = _call_kernel_direct(weights, CFG, hidden, cb0, zero_g)
    greedy = cf.predict_codes_fused(weights, CFG, hidden, cb0,
                                    jnp.float32(0.8), 50,
                                    jax.random.PRNGKey(0),
                                    greedy=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(sampled), np.asarray(greedy))


def test_sampled_gumbel_row_routing(weights, inputs):
    """A 2e30 spike in gumbel row r at index 100+r forces code 100+r at
    sampling step r — pins the row->step mapping, the mask override and
    the autoregressive feedback deterministically."""
    hidden, cb0 = inputs
    g = np.zeros((15, B, CFG.code_pred_vocab_size), np.float32)
    for r in range(15):
        g[r, :, 100 + r] = 2e30
    codes = np.asarray(_call_kernel_direct(weights, CFG, hidden, cb0,
                                           jnp.asarray(g)))
    expect = np.broadcast_to(np.arange(100, 115), (B, 15))
    np.testing.assert_array_equal(codes, expect)


def test_sampled_statistical_agreement(weights, inputs):
    """Same gumbel -> mostly the same codes as the jnp replica. Exact
    equality is impossible: the kernel's tiled matmuls round through
    bf16 in a different order, and a ~1 bf16-ulp logit shift can move a
    rank-50/51 token across the top-k boundary where a large Gumbel then
    flips the draw (observed and verified: the flipped token sits
    exactly at rank 50). Fixed seed keeps this deterministic."""
    hidden, cb0 = inputs
    key = jax.random.PRNGKey(7)
    gumbel = jax.random.gumbel(key, (15, B, CFG.code_pred_vocab_size),
                               jnp.float32)
    ref = np.asarray(_replica(weights, CFG, hidden, cb0, greedy=False,
                              temperature=0.8, top_k=50, gumbel=gumbel))
    got = np.asarray(cf.predict_codes_fused(
        weights, CFG, hidden, cb0, jnp.float32(0.8), 50, key,
        greedy=False, interpret=True))
    assert (ref == got).mean() >= 0.8


def test_temperature_zero_selects_argmax(weights, inputs):
    """tts_transformer.cpp:2198-2236: temperature <= 0 falls back to
    greedy argmax even in sampling mode (the tle0 scalar path)."""
    hidden, cb0 = inputs
    greedy = cf.predict_codes_fused(weights, CFG, hidden, cb0,
                                    jnp.float32(0.0), 50,
                                    jax.random.PRNGKey(5),
                                    greedy=True, interpret=True)
    sampled_t0 = cf.predict_codes_fused(weights, CFG, hidden, cb0,
                                        jnp.float32(0.0), 50,
                                        jax.random.PRNGKey(5),
                                        greedy=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled_t0))


def test_xla_agreement_is_high(weights, inputs):
    """The XLA path rounds attention probs to bf16 (the kernel keeps
    f32), so near-tie argmax flips cascade on some streams; with a
    fixed seed most streams still match code-for-code."""
    hidden, cb0 = inputs
    ref = code_predictor.predict_codes(weights, CFG, hidden, cb0,
                                       jnp.float32(0.9), 50,
                                       jax.random.PRNGKey(3), greedy=True)
    got = cf.predict_codes_fused(weights, CFG, hidden, cb0,
                                 jnp.float32(0.9), 50, jax.random.PRNGKey(3),
                                 greedy=True, interpret=True)
    per_stream = (np.asarray(ref) == np.asarray(got)).all(axis=1)
    assert per_stream.mean() >= 0.5, per_stream


def test_supported_gates(weights):
    assert cf.supported(CFG, 8, weights)
    assert not cf.supported(CFG, 7, weights)         # batch not /8
    import dataclasses
    small = dataclasses.replace(CFG, code_pred_hidden_size=512)
    assert not cf.supported(small, 8, weights)


def test_dispatch_env(weights, inputs):
    hidden, cb0 = inputs
    code_predictor.set_codepred_impl("fused_interpret")
    try:
        got = code_predictor.predict_codes(
            weights, CFG, hidden, cb0, jnp.float32(0.9), 50,
            jax.random.PRNGKey(3), greedy=True)
    finally:
        code_predictor.set_codepred_impl(None)
    direct = cf.predict_codes_fused(weights, CFG, hidden, cb0,
                                    jnp.float32(0.9), 50,
                                    jax.random.PRNGKey(3),
                                    greedy=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(direct))
    # auto on CPU resolves to the XLA path (backend != tpu)
    code_predictor.set_codepred_impl("auto")
    try:
        xla = code_predictor.predict_codes(
            weights, CFG, hidden, cb0, jnp.float32(0.9), 50,
            jax.random.PRNGKey(3), greedy=True)
    finally:
        code_predictor.set_codepred_impl(None)
    ref = code_predictor.predict_codes(weights, CFG, hidden, cb0,
                                       jnp.float32(0.9), 50,
                                       jax.random.PRNGKey(3), greedy=True)
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(ref))


def test_split_batch_matches_single(weights, inputs, monkeypatch):
    """B > MAX_SINGLE_B splits into two sequential half-batch kernels;
    greedy output must equal the two halves run independently (the
    split is a pure batch concatenation). Split support needs B%16
    (halves stay %8)."""
    hidden, cb0 = inputs                      # B=8 rows, tiled to 16
    h16 = jnp.concatenate([hidden, hidden * 0.7], axis=0)
    c16 = jnp.concatenate([cb0, (cb0 + 5) % CFG.code_pred_vocab_size],
                          axis=0)
    monkeypatch.setattr(cf, "MAX_SINGLE_B", 8)
    assert cf.supported(CFG, 16, weights)     # split path supported
    assert not cf.supported(CFG, 24, weights)  # halves not %8... (12%8)
    split = cf.predict_codes_fused(weights, CFG, h16, c16,
                                   jnp.float32(0.9), 50,
                                   jax.random.PRNGKey(3),
                                   greedy=True, interpret=True)
    lo = cf.predict_codes_fused(weights, CFG, h16[:8], c16[:8],
                                jnp.float32(0.9), 50,
                                jax.random.PRNGKey(3),
                                greedy=True, interpret=True)
    hi = cf.predict_codes_fused(weights, CFG, h16[8:], c16[8:],
                                jnp.float32(0.9), 50,
                                jax.random.PRNGKey(3),
                                greedy=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(split), np.concatenate([np.asarray(lo), np.asarray(hi)]))


def test_supported_rejects_f32_streamed_weights(weights):
    """The kernel DMAs wqkv/wo/w_gu/w_down into bf16 VMEM rings; a stack
    loaded at MATMUL_DTYPE=float32 (tools/parity.py's pattern) must fall
    back to XLA instead of hitting a Mosaic DMA dtype mismatch."""
    w32 = dict(weights)
    cp = dict(w32["code_pred"])
    cp["layers"] = {k: (v.astype(jnp.float32)
                        if k in ("wqkv", "wo", "w_gu", "w_down") else v)
                    for k, v in cp["layers"].items()}
    w32["code_pred"] = cp
    assert not cf.supported(CFG, 8, w32)
    assert cf.supported(CFG, 8, weights)      # control


def test_auto_skips_fused_on_multi_device(weights, inputs, monkeypatch):
    """'auto' must not trace the Mosaic kernel on a multi-device mesh
    (not auto-partitionable under GSPMD) — it falls back to the XLA
    scan. Simulated: backend reports tpu + 8 devices; the fused entry
    point is rigged to fail the test if touched."""
    hidden, cb0 = inputs
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 8)

    def boom(*a, **k):
        raise AssertionError("fused kernel dispatched on multi-device mesh")
    monkeypatch.setattr(cf, "predict_codes_fused", boom)
    code_predictor.set_codepred_impl("auto")
    try:
        got = code_predictor.predict_codes(
            weights, CFG, hidden, cb0, jnp.float32(0.9), 50,
            jax.random.PRNGKey(3), greedy=True)
    finally:
        code_predictor.set_codepred_impl(None)
    assert got.shape == (B, 15)
    # single-device tpu DOES take the kernel (proves the gate is the
    # device count, not the monkeypatched backend)
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    code_predictor.set_codepred_impl("auto")
    try:
        with pytest.raises(AssertionError, match="multi-device mesh"):
            code_predictor.predict_codes(
                weights, CFG, hidden, cb0, jnp.float32(0.9), 50,
                jax.random.PRNGKey(3), greedy=True)
    finally:
        code_predictor.set_codepred_impl(None)
