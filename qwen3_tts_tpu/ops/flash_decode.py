"""Pallas TPU flash-decode kernel: single-token GQA attention over an
HBM-resident KV cache.

TPU-native counterpart of the reference's ggml_flash_attn_ext decode path
(tts_transformer.cpp:1468-1475), redesigned for batched serving:

  - grid (B, n_kv_heads, ctx_blocks); online-softmax accumulation in VMEM
    scratch across the ctx_blocks axis (classic flash decoding).
  - per-stream valid lengths via scalar prefetch: the K/V BlockSpec
    index_map clamps out-of-range blocks to the last valid block, so
    Pallas's revisit optimization skips the HBM fetch entirely — attention
    bandwidth tracks each stream's true prefix length instead of the
    padded max context (the XLA fallback in ops/layers.py always reads
    the full padded cache).

Run on CPU via interpret mode (tests); compiled Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

DEFAULT_BLOCK = 256


def _kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref, *, block_s: int, scale: float):
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_blocks = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    nv = n_valid_ref[b]
    blk_start = j * block_s

    @pl.when(blk_start < nv)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)            # [G, D]
        k = k_ref[0, 0].astype(jnp.float32)            # [BS, D]
        v = v_ref[0, 0].astype(jnp.float32)            # [BS, D]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # [G, BS]
        pos = blk_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(pos < nv, s, NEG_INF)

        m_prev = m_ref[:]                               # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                          # [G, BS]
        alpha = jnp.exp(m_prev - m_new)                 # [G, 1]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [G, D]
        m_ref[:] = m_new

    @pl.when(j == n_blocks - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode(q: jax.Array, k: jax.Array, v: jax.Array,
                 n_valid: jax.Array, *, block_s: int = DEFAULT_BLOCK,
                 interpret: bool = False) -> jax.Array:
    """q: [B, n_heads, D]; k, v: [B, S, n_kv, D]; n_valid: [B] int32.
    Returns [B, n_heads*D] f32."""
    B, n_heads, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_heads // n_kv
    scale = 1.0 / (D ** 0.5)
    block_s = min(block_s, S)
    n_blocks = -(-S // block_s)
    if S % block_s != 0:
        pad = n_blocks * block_s - S
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))

    qg = q.reshape(B, n_kv, G, D)
    kt = k.transpose(0, 2, 1, 3)   # [B, n_kv, S, D]
    vt = v.transpose(0, 2, 1, 3)

    n_valid = n_valid.astype(jnp.int32)

    def q_map(b, h, j, nv_ref):
        return (b, h, 0, 0)

    def kv_map(b, h, j, nv_ref):
        # clamp to the last block containing valid data: out-of-range grid
        # steps re-request the same block -> Pallas skips the re-fetch
        last_valid = jnp.maximum(pl.cdiv(nv_ref[b], block_s) - 1, 0)
        return (b, h, jnp.minimum(j, last_valid), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_kv, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), q_map),
            pl.BlockSpec((1, 1, block_s, D), kv_map),
            pl.BlockSpec((1, 1, block_s, D), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), q_map),
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),   # m
            pltpu.VMEM((G, 1), jnp.float32),   # l
            pltpu.VMEM((G, D), jnp.float32),   # acc
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, block_s=block_s, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_kv, G, D), jnp.float32),
        interpret=interpret,
    )(n_valid, qg, kt, vt)
    return out.reshape(B, n_heads * D)
