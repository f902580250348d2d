"""Qwen2-style decoder stack (shared by talker and code predictor).

The reference builds one GGML graph per call over 28 unrolled layers
(tts_transformer.cpp:1233-1512); here the stack is a single lax.scan over a
stacked-weights pytree, jitted once, batched over streams.

Layer recipe (tts_transformer.cpp:1266-1356):
  x -> RMSNorm -> {Q,K,V} proj -> per-head q/k RMSNorm -> NEOX RoPE ->
  causal GQA attention -> o_proj -> +residual ->
  RMSNorm -> SwiGLU -> +residual

KV cache layout: [n_layers, 2, B, n_kv, S, D] (bf16 in HBM), the functional
equivalent of the reference's F16 per-layer cache tensors
(tts_transformer.cpp:794-842). The layout is kv-heads-MAJOR (n_kv before
S): decode attention contracts q[B,kv,G,D] against k[B,kv,S,D], so this
order lets the einsums read the cache directly. With the seq-major order
XLA materializes a transposed copy of K and V every layer — measured
3-6x slower per layer at serving shapes (NOTES.md round 2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.attention import decode_attention, decode_attention_masked
from ..ops.layers import (
    gqa_attention_prefill,
    rms_norm,
    rope_neox,
)

CACHE_DTYPE = jnp.bfloat16


class QuantKV(NamedTuple):
    """int8 KV cache with per-row (per token, per kv head) scales.

    Halves the talker's KV bytes — both HBM capacity (59 -> ~30 MB/stream
    at ctx 512, the B>160 memory wall) and the decode-attention read
    bandwidth that dominates the talker step. Allowed by the reference's
    precision constraint, which binds the CODE PREDICTOR only
    (README.md:72 — and that stack keeps its bf16 in-scan cache).
    Dequantization folds into attention as scalar-per-slot multiplies on
    scores (K) and probs (V); the int8 tensors go straight into the dots,
    so no bf16 copy of the cache is ever materialized.
    """
    values: jax.Array   # [L, 2, B, n_kv, S, D] int8
    scales: jax.Array   # [L, 2, B, n_kv, S] f32


def quantize_kv_rows(x: jax.Array):
    """[..., D] -> (int8 [..., D], f32 scale [...]): symmetric per-row
    absmax quantization."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale

# Unroll factor for the over-layers scan in PREFILL. The decode step is a
# fully-unrolled Python loop instead: passing the cache through scan xs/ys
# makes XLA copy each layer's ~100 MB cache slice through the scan
# machinery every frame (measured: 632 -> 194 us/layer at B=48 S=512 after
# unrolling + kv-major layout). Prefill's scan carries no cache, so it
# keeps the compact rolled form.
LAYER_UNROLL = 1


def init_kv_cache(n_layers: int, batch: int, max_ctx: int, n_kv: int,
                  head_dim: int, quant: bool = False,
                  layered: bool = False):
    """Allocate the decode KV cache.

    layered=False: one stacked [L, 2, B, kv, S, D] array (QuantKV pair
    when quant). layered=True: a TUPLE of L per-layer buffers
    ([2, B, kv, S, D] each; per-layer QuantKV when quant). The layered
    layout exists because XLA materializes multi-hundred-MB slice copies
    when layer l is sliced out of the stacked buffer inside the decode
    loop (measured 19.2 -> ~5 ms/frame at B=192, NOTES.md round 3);
    separate buffers let every cache read/write alias in place."""
    if layered:
        if quant:
            mk = lambda: QuantKV(
                values=jnp.zeros((2, batch, n_kv, max_ctx, head_dim),
                                 jnp.int8),
                scales=jnp.full((2, batch, n_kv, max_ctx),
                                1e-8 / 127.0, jnp.float32))
        else:
            mk = lambda: jnp.zeros((2, batch, n_kv, max_ctx, head_dim),
                                   CACHE_DTYPE)
        return tuple(mk() for _ in range(n_layers))
    if quant:
        return QuantKV(
            values=jnp.zeros((n_layers, 2, batch, n_kv, max_ctx, head_dim),
                             jnp.int8),
            scales=jnp.full((n_layers, 2, batch, n_kv, max_ctx),
                            1e-8 / 127.0, jnp.float32))
    return jnp.zeros((n_layers, 2, batch, n_kv, max_ctx, head_dim), CACHE_DTYPE)


def is_layered(kv_cache) -> bool:
    """True for the tuple-of-per-layer-buffers layout (see init_kv_cache)."""
    return (isinstance(kv_cache, (tuple, list))
            and not isinstance(kv_cache, QuantKV))


def cache_n_layers(kv_cache) -> int:
    if is_layered(kv_cache):
        return len(kv_cache)
    return (kv_cache.values if isinstance(kv_cache, QuantKV)
            else kv_cache).shape[0]


def _qkv(wl, x_norm: jax.Array, n_heads: int, n_kv: int, head_dim: int,
         eps: float, theta: float, positions: jax.Array):
    """QKV projection + per-head norm + RoPE. x_norm: [B,T,H] f32.

    Two weight layouts: fused "wqkv" (single-device fast path — one
    matmul) or unfused "wq"/"wk"/"wv" (tp>1 meshes, where each projection
    is column-sharded without crossing the q/k/v boundary —
    parallel/mesh.unfuse_stack_layers)."""
    B, T = x_norm.shape[0], x_norm.shape[1]
    nq = n_heads * head_dim
    nk = n_kv * head_dim
    if "wq" in wl:
        xb = x_norm.astype(wl["wq"].dtype)
        q = jnp.dot(xb, wl["wq"], preferred_element_type=jnp.float32)
        k = jnp.dot(xb, wl["wk"], preferred_element_type=jnp.float32)
        v = jnp.dot(xb, wl["wv"], preferred_element_type=jnp.float32)
        q = q.reshape(B, T, n_heads, head_dim)
        k = k.reshape(B, T, n_kv, head_dim)
        v = v.reshape(B, T, n_kv, head_dim)
    else:
        xb = x_norm.astype(wl["wqkv"].dtype)
        qkv = jnp.dot(xb, wl["wqkv"], preferred_element_type=jnp.float32)
        q = qkv[..., :nq].reshape(B, T, n_heads, head_dim)
        k = qkv[..., nq:nq + nk].reshape(B, T, n_kv, head_dim)
        v = qkv[..., nq + nk:].reshape(B, T, n_kv, head_dim)
    # Per-head q/k RMSNorm before RoPE (tts_transformer.cpp:1280-1288)
    q = rms_norm(q, wl["q_norm"], eps)
    k = rms_norm(k, wl["k_norm"], eps)
    q = rope_neox(q, positions, theta)
    k = rope_neox(k, positions, theta)
    return q, k, v


def _ffn(wl, x: jax.Array, eps: float) -> jax.Array:
    """SwiGLU FFN; fused "w_gu" or unfused "w_gate"/"w_up" layouts (the
    latter for tp>1 column sharding — see _qkv)."""
    if "w_gate" in wl:
        h = rms_norm(x, wl["ffn_norm"], eps).astype(wl["w_gate"].dtype)
        gate = jnp.dot(h, wl["w_gate"], preferred_element_type=jnp.float32)
        up = jnp.dot(h, wl["w_up"], preferred_element_type=jnp.float32)
    else:
        h = rms_norm(x, wl["ffn_norm"], eps).astype(wl["w_gu"].dtype)
        gu = jnp.dot(h, wl["w_gu"], preferred_element_type=jnp.float32)
        gate, up = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(gate) * up).astype(wl["w_down"].dtype)
    return jnp.dot(act, wl["w_down"], preferred_element_type=jnp.float32)


def stack_prefill(layers_w, x: jax.Array, positions: jax.Array, *,
                  n_heads: int, n_kv: int, head_dim: int,
                  eps: float, theta: float):
    """Run a T-token prefill from an empty cache.

    x: [B, T, H] (any float dtype; residual stream kept f32)
    positions: [B, T] int32
    Returns (y [B,T,H] f32 pre-output-norm, k_all, v_all [L,B,T,n_kv,D] bf16).
    """
    def layer(carry, wl):
        x = carry
        h = rms_norm(x, wl["attn_norm"], eps)
        q, k, v = _qkv(wl, h, n_heads, n_kv, head_dim, eps, theta, positions)
        attn = gqa_attention_prefill(q.astype(CACHE_DTYPE),
                                     k.astype(CACHE_DTYPE),
                                     v.astype(CACHE_DTYPE))
        attn = jnp.dot(attn.astype(wl["wo"].dtype), wl["wo"],
                       preferred_element_type=jnp.float32)
        x = x + attn
        x = x + _ffn(wl, x, eps)
        return x, (k.astype(CACHE_DTYPE), v.astype(CACHE_DTYPE))

    x = x.astype(jnp.float32)
    y, (ks, vs) = jax.lax.scan(layer, x, layers_w, unroll=LAYER_UNROLL)
    return y, ks, vs


def write_prefill_to_cache(kv_cache, ks: jax.Array, vs: jax.Array,
                           start: int = 0):
    """Write prefill K/V ([L,B,T,kv,D]) into the kv-major cache at `start`."""
    kv = jnp.stack([ks, vs], axis=1)                # [L,2,B,T,kv,D]
    kv = kv.transpose(0, 1, 2, 4, 3, 5)             # [L,2,B,kv,T,D]
    if is_layered(kv_cache):
        out = []
        for l, cl in enumerate(kv_cache):
            if isinstance(cl, QuantKV):
                q, s = quantize_kv_rows(kv[l])
                out.append(QuantKV(
                    values=jax.lax.dynamic_update_slice(
                        cl.values, q, (0, 0, 0, start, 0)),
                    scales=jax.lax.dynamic_update_slice(
                        cl.scales, s, (0, 0, 0, start))))
            else:
                out.append(jax.lax.dynamic_update_slice(
                    cl, kv[l].astype(cl.dtype), (0, 0, 0, start, 0)))
        return tuple(out)
    if isinstance(kv_cache, QuantKV):
        q, s = quantize_kv_rows(kv)
        return QuantKV(
            values=jax.lax.dynamic_update_slice(
                kv_cache.values, q, (0, 0, 0, 0, start, 0)),
            scales=jax.lax.dynamic_update_slice(
                kv_cache.scales, s, (0, 0, 0, 0, start)))
    return jax.lax.dynamic_update_slice(
        kv_cache, kv.astype(kv_cache.dtype), (0, 0, 0, 0, start, 0))


def stack_step(layers_w, x: jax.Array, positions: jax.Array,
               kv_cache: jax.Array, write_idx: jax.Array,
               n_valid: jax.Array, *,
               n_heads: int, n_kv: int, head_dim: int,
               eps: float, theta: float, read_ctx: int | None = None,
               valid_mask: jax.Array | None = None,
               window_lo: jax.Array | None = None,
               window_hi: jax.Array | None = None,
               prefill_len: int = 0):
    """Single-token decode step.

    x: [B, H]; positions: [B] int32 (RoPE position per stream);
    kv_cache: [L, 2, B, n_kv, S, D] (kv-major) OR the layered layout — a
    tuple of L per-layer [2, B, n_kv, S, D] buffers (see init_kv_cache:
    separate buffers keep XLA from materializing per-layer slice copies
    of the stacked array); write_idx: scalar int32 OR
    [B] int32 cache slot(s) — per-stream indices enable continuous
    batching where each stream sits at a different depth; n_valid: [B]
    valid cache length AFTER this token is appended.

    The layer loop is a fully-unrolled Python loop with one in-place
    dynamic-update-slice per layer into the donated full cache. Passing
    the cache through a lax.scan's xs/ys (the previous design) made XLA
    copy each layer's full cache slice every frame — at B=48 S=512 that
    was ~2/3 of the whole talker step (NOTES.md round 2).

    read_ctx (static): attention reads only the first read_ctx cache rows
    — the caller guarantees max(n_valid) <= read_ctx. This makes attention
    bandwidth track the live prefix instead of the padded max context
    (chunk-level bucketing; one compile per bucket).

    valid_mask: [B, S] bool — when given, attention masks by this bitmask
    instead of the n_valid prefix length (ring-slot cache mode, where a
    stream's valid slots are not contiguous). window_lo/window_hi +
    prefill_len optionally bound each stream's valid slots to
    [0, prefill_len) U [lo, hi) so the flash kernel (when explicitly
    selected) fetches only those blocks (ops/flash_decode.py).
    Returns (y [B,H] f32 pre-output-norm, new_kv_cache).
    """
    per_stream = getattr(write_idx, "ndim", 0) == 1
    layered = is_layered(kv_cache)
    L = cache_n_layers(kv_cache)
    B = x.shape[0]
    if layered:
        caches = list(kv_cache)

    x = x.astype(jnp.float32)
    for l in range(L):
        wl = jax.tree.map(lambda a: a[l], layers_w)
        h = rms_norm(x, wl["attn_norm"], eps)[:, None, :]   # [B,1,H]
        q, k, v = _qkv(wl, h, n_heads, n_kv, head_dim, eps, theta,
                       positions[:, None])
        # k, v: [B, 1, kv, D] -> cache rows [B, kv, D]
        quant = isinstance(caches[l] if layered else kv_cache, QuantKV)
        if quant:
            k_row, k_s = quantize_kv_rows(k[:, 0])
            v_row, v_s = quantize_kv_rows(v[:, 0])
            if layered:
                values, scales = caches[l].values, caches[l].scales
                if per_stream:
                    bidx = jnp.arange(B)
                    values = values.at[0, bidx, :, write_idx].set(k_row)
                    values = values.at[1, bidx, :, write_idx].set(v_row)
                    scales = scales.at[0, bidx, :, write_idx].set(k_s)
                    scales = scales.at[1, bidx, :, write_idx].set(v_s)
                else:
                    new_kv = jnp.stack([k_row, v_row])[:, :, :, None, :]
                    values = jax.lax.dynamic_update_slice(
                        values, new_kv, (0, 0, 0, write_idx, 0))
                    new_s = jnp.stack([k_s, v_s])[:, :, :, None]
                    scales = jax.lax.dynamic_update_slice(
                        scales, new_s, (0, 0, 0, write_idx))
                caches[l] = QuantKV(values, scales)
                k_l, v_l = values[0], values[1]             # int8
                k_scale, v_scale = scales[0], scales[1]     # [B, kv, S]
            else:
                values, scales = kv_cache.values, kv_cache.scales
                if per_stream:
                    bidx = jnp.arange(B)
                    values = values.at[l, 0, bidx, :, write_idx].set(k_row)
                    values = values.at[l, 1, bidx, :, write_idx].set(v_row)
                    scales = scales.at[l, 0, bidx, :, write_idx].set(k_s)
                    scales = scales.at[l, 1, bidx, :, write_idx].set(v_s)
                else:
                    new_kv = jnp.stack([k_row, v_row])[None, :, :, :, None, :]
                    values = jax.lax.dynamic_update_slice(
                        values, new_kv, (l, 0, 0, 0, write_idx, 0))
                    new_s = jnp.stack([k_s, v_s])[None, :, :, :, None]
                    scales = jax.lax.dynamic_update_slice(
                        scales, new_s, (l, 0, 0, 0, write_idx))
                kv_cache = QuantKV(values, scales)
                k_l, v_l = values[l, 0], values[l, 1]           # int8
                k_scale, v_scale = scales[l, 0], scales[l, 1]   # [B, kv, S]
        elif layered:
            cl = caches[l]
            k_row = k[:, 0].astype(cl.dtype)
            v_row = v[:, 0].astype(cl.dtype)
            if per_stream:
                bidx = jnp.arange(B)
                cl = cl.at[0, bidx, :, write_idx].set(k_row)
                cl = cl.at[1, bidx, :, write_idx].set(v_row)
            else:
                new_kv = jnp.stack([k_row, v_row])[:, :, :, None, :]
                cl = jax.lax.dynamic_update_slice(
                    cl, new_kv, (0, 0, 0, write_idx, 0))
            caches[l] = cl
            k_l, v_l = cl[0], cl[1]                         # [B, kv, S, D]
            k_scale = v_scale = None
        else:
            k_row = k[:, 0].astype(kv_cache.dtype)
            v_row = v[:, 0].astype(kv_cache.dtype)
            if per_stream:
                # scatter: each stream writes its own slot (legacy
                # non-lockstep path; production uses scalar slots)
                bidx = jnp.arange(B)
                kv_cache = kv_cache.at[l, 0, bidx, :, write_idx].set(k_row)
                kv_cache = kv_cache.at[l, 1, bidx, :, write_idx].set(v_row)
            else:
                new_kv = jnp.stack([k_row, v_row])[None, :, :, :, None, :]
                kv_cache = jax.lax.dynamic_update_slice(
                    kv_cache, new_kv, (l, 0, 0, 0, write_idx, 0))
            k_l = kv_cache[l, 0]                            # [B, kv, S, D]
            v_l = kv_cache[l, 1]
            k_scale = v_scale = None
        if valid_mask is not None:
            attn = decode_attention_masked(
                q[:, 0].astype(CACHE_DTYPE), k_l, v_l,
                valid_mask, read_ctx=read_ctx,
                window_lo=window_lo, window_hi=window_hi,
                prefill_len=prefill_len,
                k_scale=k_scale, v_scale=v_scale)
        else:
            attn = decode_attention(q[:, 0].astype(CACHE_DTYPE),
                                    k_l, v_l, n_valid,
                                    read_ctx=read_ctx,
                                    k_scale=k_scale, v_scale=v_scale)
        attn = jnp.dot(attn.astype(wl["wo"].dtype), wl["wo"],
                       preferred_element_type=jnp.float32)
        x = x + attn
        x = x + _ffn(wl, x, eps)
    return x, (tuple(caches) if layered else kv_cache)
