"""Decode-attention dispatcher over the kv-heads-major cache layout.

Mirrors the reference's backend-dispatch idea (GGML flash-attn vs masked
softmax, tts_transformer.cpp:2164-2183) but as a process-level switch.

Production default is the XLA einsum on the kv-major cache
([B, n_kv, S, D]): measured on v5e (round 2, NOTES.md), reading the cache
in einsum order with no transpose runs at 194 us/layer (B=48, S=512) and
355 us/layer (B=48, S=1152 masked) — 3-6x faster than the seq-major
layout and 4x faster than the Pallas flash-decode kernel at the same
shapes. The flash kernel (ops/flash_decode.py) reads the seq-major layout
and is kept as an explicitly-selectable implementation (it pays a
transpose at this boundary), for A/B measurement and as a fallback design
point for much longer contexts than this model ever reaches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flash_decode import flash_decode, flash_decode_masked
from .layers import gqa_attention_step_kvmajor

_IMPL = "auto"
_VALID = ("auto", "flash", "flash_interpret", "xla")


def set_decode_attention_impl(impl: str) -> None:
    global _IMPL
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}")
    _IMPL = impl


def get_decode_attention_impl() -> str:
    return _IMPL


def _resolve() -> str:
    # "auto" = XLA kv-major einsum everywhere: it beat the flash kernel at
    # every serving shape once the cache went kv-major (NOTES.md round 2).
    return "xla" if _IMPL == "auto" else _IMPL


def _slice_window(k, v, mask, read_ctx, k_scale=None, v_scale=None):
    if read_ctx is not None:
        k, v = k[:, :, :read_ctx], v[:, :, :read_ctx]
        mask = mask[:, :read_ctx]
        if k_scale is not None:
            k_scale = k_scale[:, :, :read_ctx]
            v_scale = v_scale[:, :, :read_ctx]
    return k, v, mask, k_scale, v_scale


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     n_valid: jax.Array,
                     read_ctx: int | None = None,
                     k_scale: jax.Array | None = None,
                     v_scale: jax.Array | None = None) -> jax.Array:
    """Prefix-validity decode attention.

    q: [B, n_heads, D]; k, v: [B, n_kv, S, D] full padded kv-major cache;
    n_valid: [B]; read_ctx (static) bounds any stream's valid length.
    k_scale/v_scale: [B, n_kv, S] per-row dequant scales when the cache is
    int8 (models/stack.QuantKV) — the int8 path always uses the XLA
    einsums (the flash kernel reads bf16)."""
    impl = _resolve()
    if impl in ("flash", "flash_interpret") and k_scale is None:
        try:
            # kernel reads the seq-major layout; transpose at the boundary
            ks = k.transpose(0, 2, 1, 3)
            vs = v.transpose(0, 2, 1, 3)
            return flash_decode(q, ks, vs, n_valid, read_ctx=read_ctx,
                                interpret=impl == "flash_interpret")
        except Exception:
            # graceful degradation, mirroring the reference's
            # backend-fallback behavior (tts_transformer.cpp:2164-2183)
            pass
    S = k.shape[2]
    mask = jnp.arange(S)[None, :] < n_valid[:, None]
    k, v, mask, k_scale, v_scale = _slice_window(k, v, mask, read_ctx,
                                                 k_scale, v_scale)
    return gqa_attention_step_kvmajor(q, k, v, mask, k_scale, v_scale)


def decode_attention_masked(q: jax.Array, k: jax.Array, v: jax.Array,
                            valid_mask: jax.Array,
                            read_ctx: int | None = None,
                            window_lo: jax.Array | None = None,
                            window_hi: jax.Array | None = None,
                            prefill_len: int = 0,
                            k_scale: jax.Array | None = None,
                            v_scale: jax.Array | None = None) -> jax.Array:
    """Bitmask decode attention (ring-slot cache serving).

    q: [B, n_heads, D]; k, v: [B, n_kv, S, D]; valid_mask: [B, S].
    window_lo/window_hi + prefill_len bound each stream's valid slots to
    [0, prefill_len) U [lo, hi) — only the flash kernel exploits this
    (block skipping); the XLA path's bandwidth is already bounded by
    read_ctx and the bitmask costs nothing extra. k_scale/v_scale: int8
    cache dequant scales (see decode_attention)."""
    impl = _resolve()
    if impl in ("flash", "flash_interpret") and k_scale is None:
        try:
            ks = k.transpose(0, 2, 1, 3)
            vs = v.transpose(0, 2, 1, 3)
            return flash_decode_masked(
                q, ks, vs, valid_mask, window_lo=window_lo,
                window_hi=window_hi, prefill_len=prefill_len,
                read_ctx=read_ctx,
                interpret=impl == "flash_interpret")
        except Exception:
            pass
    k, v, valid_mask, k_scale, v_scale = _slice_window(
        k, v, valid_mask, read_ctx, k_scale, v_scale)
    return gqa_attention_step_kvmajor(q, k, v, valid_mask, k_scale, v_scale)
