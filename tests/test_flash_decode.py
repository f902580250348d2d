"""Pallas flash-decode kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops.flash_decode import flash_decode, flash_decode_masked
from qwen3_tts_tpu.ops.layers import (gqa_attention_step,
                                      gqa_attention_step_masked)
from qwen3_tts_tpu.ops import attention


def _mk(B, S, n_heads, n_kv, D, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, n_heads, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("shape", [
    (2, 256, 16, 8, 128),    # talker dims
    (2, 16, 4, 2, 64),       # code-pred-like tiny dims
    (1, 512, 16, 8, 128),
])
def test_flash_matches_xla(shape):
    B, S, n_heads, n_kv, D = shape
    q, k, v = _mk(*shape)
    n_valid = jnp.asarray(
        np.random.default_rng(1).integers(1, S + 1, (B,)), jnp.int32)
    want = gqa_attention_step(q, k, v, n_valid)
    got = flash_decode(q, k, v, n_valid, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_ragged_lengths():
    B, S, n_heads, n_kv, D = 4, 384, 16, 8, 128
    q, k, v = _mk(B, S, n_heads, n_kv, D, seed=2)
    n_valid = jnp.asarray([1, 128, 200, 384], jnp.int32)
    want = gqa_attention_step(q, k, v, n_valid)
    got = flash_decode(q, k, v, n_valid, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_nondivisible_ctx():
    # S not a multiple of the block size: padded internally
    B, S, n_heads, n_kv, D = 2, 200, 8, 4, 64
    q, k, v = _mk(B, S, n_heads, n_kv, D, seed=3)
    n_valid = jnp.asarray([200, 77], jnp.int32)
    want = gqa_attention_step(q, k, v, n_valid)
    got = flash_decode(q, k, v, n_valid, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_masked_matches_xla():
    """Bitmask variant (ring-slot cache): arbitrary scattered validity."""
    B, S, n_heads, n_kv, D = 3, 256, 16, 8, 128
    q, k, v = _mk(B, S, n_heads, n_kv, D, seed=5)
    rng = np.random.default_rng(6)
    mask = rng.random((B, S)) < 0.4
    mask[:, 0] = True  # at least one valid slot per stream
    mask_j = jnp.asarray(mask)
    want = gqa_attention_step_masked(q, k, v, mask_j)
    got = flash_decode_masked(q, k, v, mask_j, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_masked_window_skips_blocks():
    """Ring-window mode: valid bits confined to [0,P) U [lo,hi); the
    schedule must fetch only overlapping blocks yet match the full-mask
    XLA result exactly."""
    B, S, n_heads, n_kv, D = 4, 512, 16, 8, 128
    q, k, v = _mk(B, S, n_heads, n_kv, D, seed=7)
    P = 16
    rng = np.random.default_rng(8)
    lo = np.array([16, 130, 300, 450], np.int32)
    hi_scalar = 460
    mask = np.zeros((B, S), bool)
    for b in range(B):
        lo_b, hi_b = int(lo[b]), hi_scalar
        mask[b, :10] = True  # prefill rows
        if lo_b <= hi_b:
            sl = np.arange(lo_b, hi_b)
        else:
            sl = np.r_[np.arange(P, hi_b), np.arange(lo_b, S)]
        mask[b, sl] = rng.random(len(sl)) < 0.7
    mask_j = jnp.asarray(mask)
    want = gqa_attention_step_masked(q, k, v, mask_j)
    got = flash_decode_masked(
        q, k, v, mask_j, window_lo=jnp.asarray(lo),
        window_hi=jnp.int32(hi_scalar), prefill_len=P,
        block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_masked_window_wraparound():
    """lo > hi (ring wrapped): window = [P, hi) U [lo, S)."""
    B, S, n_heads, n_kv, D = 2, 384, 8, 4, 64
    q, k, v = _mk(B, S, n_heads, n_kv, D, seed=9)
    P = 16
    lo = np.array([300, 350], np.int32)
    hi_scalar = 120  # wrapped
    rng = np.random.default_rng(10)
    mask = np.zeros((B, S), bool)
    for b in range(B):
        mask[b, :10] = True
        sl = np.r_[np.arange(P, hi_scalar), np.arange(int(lo[b]), S)]
        mask[b, sl] = rng.random(len(sl)) < 0.7
    mask_j = jnp.asarray(mask)
    want = gqa_attention_step_masked(q, k, v, mask_j)
    got = flash_decode_masked(
        q, k, v, mask_j, window_lo=jnp.asarray(lo),
        window_hi=jnp.int32(hi_scalar), prefill_len=P,
        block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_read_ctx_bound():
    """read_ctx caps the schedule: slots beyond it are never valid, and
    the result matches XLA on the full mask."""
    B, S, n_heads, n_kv, D = 2, 512, 8, 4, 64
    q, k, v = _mk(B, S, n_heads, n_kv, D, seed=11)
    n_valid = jnp.asarray([100, 250], jnp.int32)
    want = gqa_attention_step(q, k, v, n_valid)
    got = flash_decode(q, k, v, n_valid, read_ctx=256, block_s=128,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_dispatcher_switch():
    q, k, v = _mk(1, 64, 4, 2, 64, seed=4)
    # the dispatcher takes the kv-major cache layout [B, n_kv, S, D]
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    n_valid = jnp.asarray([33], jnp.int32)
    attention.set_decode_attention_impl("flash_interpret")
    try:
        a = attention.decode_attention(q, kt, vt, n_valid)
    finally:
        attention.set_decode_attention_impl("auto")
    b = attention.decode_attention(q, kt, vt, n_valid)  # xla einsum
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-4)
    with pytest.raises(ValueError):
        attention.set_decode_attention_impl("bogus")


def test_all_masked_stream_outputs_zero(rng):
    """A stream with zero valid slots must output ~0, not the mean of
    garbage V rows (NEG_INF is finfo.min, so exp(s - m) was 1 for every
    masked slot before the explicit p-zeroing)."""
    B, n_heads, n_kv, D, S = 2, 4, 2, 16, 32
    q = jnp.asarray(rng.standard_normal((B, n_heads, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.bfloat16)
    n_valid = jnp.asarray([0, 5], jnp.int32)   # stream 0 fully masked
    out = flash_decode(q, k, v, n_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
    assert np.abs(np.asarray(out[1])).max() > 0


def test_masked_window_requires_pair(rng):
    B, n_heads, n_kv, D, S = 1, 4, 2, 16, 32
    q = jnp.asarray(rng.standard_normal((B, n_heads, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), bool)
    with pytest.raises(ValueError, match="together"):
        flash_decode_masked(q, k, v, mask,
                            window_lo=jnp.zeros((B,), jnp.int32))
