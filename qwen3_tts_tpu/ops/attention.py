"""Decode-attention dispatcher: Pallas flash-decode on TPU, XLA fallback.

Mirrors the reference's backend-dispatch idea (GGML flash-attn vs masked
softmax) but as a process-level switch; "auto" picks the Pallas kernel on
TPU and the XLA einsum path elsewhere.

Both entry points take the FULL padded cache [B, S, n_kv, D]: the flash
kernel bounds its HBM reads with a block schedule (no slice copy), the
XLA path slices to read_ctx (fused by XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flash_decode import flash_decode, flash_decode_masked
from .layers import gqa_attention_step, gqa_attention_step_masked

_IMPL = "auto"
_VALID = ("auto", "flash", "flash_interpret", "xla")


def set_decode_attention_impl(impl: str) -> None:
    global _IMPL
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}")
    _IMPL = impl


def get_decode_attention_impl() -> str:
    return _IMPL


def _resolve(k: jax.Array | None = None,
             read_ctx: int | None = None) -> str:
    if _IMPL != "auto":
        return _IMPL
    if jax.default_backend() != "tpu":
        return "xla"
    if k is not None:
        # Mosaic-friendliness: the kernel slices [*, n_kv*D] lanes per
        # head at 128 alignment and DMAs [block, n_kv*D] slabs; tiny test
        # configs (D<128) would fail to compile.
        n_kv, D = k.shape[2], k.shape[3]
        if D % 128 != 0 or (n_kv * D) % 128 != 0:
            return "xla"
        # Measured crossover on v5e (tools/bench_attention.py, NOTES.md):
        # XLA's fused einsum runs at the HBM roofline for short read
        # windows; the kernel's block-schedule read savings win once the
        # effective window is long (serving ring ctx reaches 1152 at
        # default max_frames=1024). Below, reading everything is faster.
        window = min(read_ctx or k.shape[1], k.shape[1])
        if window < 1024:
            return "xla"
    return "flash"


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     n_valid: jax.Array,
                     read_ctx: int | None = None) -> jax.Array:
    """Prefix-validity decode attention.

    q: [B, n_heads, D]; k, v: [B, S, n_kv, D] full padded cache;
    n_valid: [B]; read_ctx (static) bounds any stream's valid length."""
    impl = _resolve(k, read_ctx)
    if impl in ("flash", "flash_interpret"):
        try:
            return flash_decode(q, k, v, n_valid, read_ctx=read_ctx,
                                interpret=impl == "flash_interpret")
        except Exception:
            # graceful degradation, mirroring the reference's
            # backend-fallback behavior (tts_transformer.cpp:2164-2183)
            pass
    if read_ctx is not None:
        k, v = k[:, :read_ctx], v[:, :read_ctx]
    return gqa_attention_step(q, k, v, n_valid)


def decode_attention_masked(q: jax.Array, k: jax.Array, v: jax.Array,
                            valid_mask: jax.Array,
                            read_ctx: int | None = None,
                            window_lo: jax.Array | None = None,
                            window_hi: jax.Array | None = None,
                            prefill_len: int = 0) -> jax.Array:
    """Bitmask decode attention (ring-slot cache serving).

    valid_mask: [B, S]; optional per-stream ring window [lo, hi) +
    prefill_len lets the flash kernel fetch only the blocks a stream's
    lifetime can have touched."""
    impl = _resolve(k, read_ctx)
    if impl in ("flash", "flash_interpret"):
        try:
            return flash_decode_masked(
                q, k, v, valid_mask, window_lo=window_lo,
                window_hi=window_hi, prefill_len=prefill_len,
                read_ctx=read_ctx,
                interpret=impl == "flash_interpret")
        except Exception:
            pass
    if read_ctx is not None:
        k, v = k[:, :read_ctx], v[:, :read_ctx]
        valid_mask = valid_mask[:, :read_ctx]
    return gqa_attention_step_masked(q, k, v, valid_mask)
