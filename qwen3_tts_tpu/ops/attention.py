"""Decode-attention dispatcher: Pallas flash-decode on TPU, XLA fallback.

Mirrors the reference's backend-dispatch idea (GGML flash-attn vs masked
softmax) but as a process-level switch; "auto" picks the Pallas kernel on
TPU and the XLA einsum path elsewhere.
"""

from __future__ import annotations

import jax

from .flash_decode import flash_decode
from .layers import gqa_attention_step

_IMPL = "auto"
_VALID = ("auto", "flash", "flash_interpret", "xla")


def set_decode_attention_impl(impl: str) -> None:
    global _IMPL
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}")
    _IMPL = impl


def get_decode_attention_impl() -> str:
    return _IMPL


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     n_valid: jax.Array) -> jax.Array:
    """q: [B, n_heads, D]; k, v: [B, S, n_kv, D]; n_valid: [B]."""
    impl = _IMPL
    if impl == "auto":
        # Measured on v5e at B=16: the XLA einsum path wins for short
        # padded contexts (<=1k); the Pallas kernel's per-program overhead
        # (grid B*n_kv*blocks of tiny G-row tiles) only amortizes once the
        # cache is long enough that skipping invalid blocks dominates.
        S = k.shape[1]
        use_flash = jax.default_backend() == "tpu" and S > 1024
        impl = "flash" if use_flash else "xla"
    if impl == "flash":
        try:
            return flash_decode(q, k, v, n_valid)
        except Exception:
            # graceful degradation, mirroring the reference's
            # backend-fallback behavior (tts_transformer.cpp:2164-2183)
            return gqa_attention_step(q, k, v, n_valid)
    if impl == "flash_interpret":
        return flash_decode(q, k, v, n_valid, interpret=True)
    return gqa_attention_step(q, k, v, n_valid)
