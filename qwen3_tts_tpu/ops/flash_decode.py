"""Pallas TPU flash-decode kernel: single-token GQA attention over an
HBM-resident KV cache.

TPU-native counterpart of the reference's ggml_flash_attn_ext decode path
(tts_transformer.cpp:1468-1475), redesigned for batched serving.

v4 design (v1-v3 measured against XLA's fused einsum on v5e; NOTES.md):
  - ONE program; stream-major global (stream, block) schedule, computed
    in XLA and scalar-prefetched; single continuously-pipelined
    double-buffered DMA queue (one warm-up stall total).
  - K/V stay in HBM in the cache's native [B, S, n_kv, D] layout (no
    transpose copies); only SCHEDULED blocks are ever fetched:
      prefix  — valid slots are [0, n_valid): blocks 0..cdiv(nv, bs)
      masked  — arbitrary validity bitmask [B, S] (ring-slot cache)
      window  — bitmask + per-stream ring window [lo, hi) (+ prefill
                prefix): HBM traffic tracks each stream's lifetime, not
                the global ring coverage — the case where a kernel can
                beat the XLA path, which must read the whole context.
  - per-entry work is two MXU dots via block-diagonal GQA folding:
    q is laid out once per stream as a [n_kv*D, n_heads] block-diagonal
    matrix, so scores for ALL heads are one [bs, kvD] x [kvD, n_heads]
    dot, and p^T V is one [n_heads, bs] x [bs, kvD] dot whose diagonal
    blocks are extracted with static slices.
  - online-softmax state lives in fori_loop carries (vector registers),
    never in dynamically-indexed VMEM — v3's dynamic sublane
    read-modify-writes were ~20 us/entry.

Run on CPU via interpret mode (tests); compiled Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

DEFAULT_BLOCK = 384
N_BUF = 4  # DMA pipeline depth (up to N_BUF-1 block fetches in flight)


def _pick_block(S: int, requested: int) -> int:
    """Largest candidate block size that divides S — padding the cache to
    a block multiple would copy the whole cache (caches are 128-aligned,
    so 128 always divides)."""
    for cand in (384, 256, 128):
        if cand <= requested and S % cand == 0:
            return cand
    return min(requested, S)


def _kernel(seg_ref, entry_b_ref, entry_blk_ref, qd_ref, mask_ref,
            k_ref, v_ref, o_ref, kbuf, vbuf, k_sems, v_sems,
            *, block_s: int, n_kv: int, G: int, D: int, B: int, NB: int):
    """Single program; stream-major (stream, block) schedule.

    seg_ref:      [B+1] i32 (prefetch) — entry range of each stream
    entry_b/blk:  [N] i32 (prefetch) — schedule entries
    qd_ref:   [B, n_heads, n_kv*D] VMEM — pre-scaled block-diagonal q
              fold, stored heads-major so the minor dim is lane-sized
              (a [*, 16] minor dim pads to 128 lanes = 8x VMEM); built in
              XLA (Mosaic lacks scatter/value-DUS)
    mask_ref: [B*NB_total, block_s] i32 VMEM — per-slot validity rows
              (2-D: Mosaic only supports 2-D dynamic-row gathers)
    k_ref/v_ref: [B, S, n_kv*D] HBM (unblocked)
    o_ref:    [B, n_heads, D] f32 VMEM
    kbuf/vbuf: (2, block_s, n_kv*D) VMEM scratch (double buffers)
    """
    n_heads = n_kv * G
    total = seg_ref[B]

    def k_dma(slot, t):
        b, blk = entry_b_ref[t], entry_blk_ref[t]
        return pltpu.make_async_copy(
            k_ref.at[b, pl.ds(blk * block_s, block_s), :],
            kbuf.at[slot], k_sems.at[slot])

    def v_dma(slot, t):
        b, blk = entry_b_ref[t], entry_blk_ref[t]
        return pltpu.make_async_copy(
            v_ref.at[b, pl.ds(blk * block_s, block_s), :],
            vbuf.at[slot], v_sems.at[slot])

    # warm-up: fill the DMA pipeline (N_BUF-1 fetches in flight)
    for w in range(N_BUF - 1):
        @pl.when(w < total)
        def _(w=w):
            k_dma(w, w).start()
            v_dma(w, w).start()

    def stream_body(b, _):
        start, end = seg_ref[b], seg_ref[b + 1]
        qd = qd_ref[b]                                  # [n_heads, kvD]

        def entry_body(t, carry):
            m, l, acc = carry                           # [1,nh],[1,nh],[nh,D]
            slot = jax.lax.rem(t, N_BUF)
            nslot = jax.lax.rem(t + N_BUF - 1, N_BUF)

            @pl.when(t + N_BUF - 1 < total)
            def _():
                k_dma(nslot, t + N_BUF - 1).start()
                v_dma(nslot, t + N_BUF - 1).start()

            k_dma(slot, t).wait()
            v_dma(slot, t).wait()

            blk = entry_blk_ref[t]
            # minor-dim insert on the i32 row, compare in 2-D — Mosaic
            # cannot reshape a 1-D i1 vector to [bs, 1]
            mrow = mask_ref[b * NB + blk, :]            # [bs] i32
            kmat = kbuf[slot].astype(jnp.float32)       # [bs, kvD]
            s = jax.lax.dot_general(
                kmat, qd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [bs, n_heads]
            s = jnp.where(mrow[:, None] == 0, NEG_INF, s)

            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp(s - m_new)                      # [bs, n_heads]
            # explicit zero for masked slots: NEG_INF is finfo.min, not
            # -inf, so an ALL-masked stream otherwise gets p = exp(0) = 1
            # everywhere and outputs the mean of garbage V rows
            p = jnp.where(mrow[:, None] == 0, 0.0, p)
            alpha = jnp.exp(m - m_new)                  # [1, n_heads]
            l = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            vmat = vbuf[slot].astype(jnp.float32)       # [bs, kvD]
            pv = jax.lax.dot_general(
                p, vmat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [n_heads, kvD]
            # diagonal blocks: head rows h*G:(h+1)*G take cols h*D:(h+1)*D
            upd = jnp.concatenate(
                [pv[h * G:(h + 1) * G, h * D:(h + 1) * D]
                 for h in range(n_kv)], axis=0)          # [n_heads, D]
            acc = acc * alpha.T + upd
            return m_new, l, acc

        m0 = jnp.full((1, n_heads), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, n_heads), jnp.float32)
        a0 = jnp.zeros((n_heads, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(start, end, entry_body, (m0, l0, a0))
        o_ref[b] = acc / jnp.maximum(l.T, 1e-30)

    jax.lax.fori_loop(0, B, stream_body, None)


def _schedule(needed: jax.Array):
    """needed: [B, NB] bool -> stream-major entries + per-stream segments.

    Every stream contributes at least its block 0 entry so the query row
    always has one scheduled block (harmless extra read; masked anyway)."""
    B, NB = needed.shape
    needed = needed.at[:, 0].set(True)
    flat = needed.reshape(-1)
    order = jnp.argsort(~flat, stable=True).astype(jnp.int32)
    entry_b = order // NB
    entry_blk = order % NB
    counts = jnp.sum(needed, axis=1).astype(jnp.int32)
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    return seg.astype(jnp.int32), entry_b, entry_blk


def _prefix_needed(n_valid: jax.Array, n_blocks: int, block_s: int):
    j = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
    return j * block_s < n_valid[:, None]


def _window_needed(n_blocks: int, block_s: int, prefill_len: int,
                   lo: jax.Array, hi: jax.Array):
    """Blocks overlapping [0, prefill_len) or the per-stream modular ring
    window [lo, hi) (wraparound when lo > hi: [.., hi) U [lo, ..)).
    Only a SUPERSET of valid slots is required — the bitmask filters
    exactly inside each block."""
    j = jnp.arange(n_blocks, dtype=jnp.int32)
    b_start = (j * block_s)[None, :]                       # [1, NB]
    b_end = b_start + block_s
    lo_, hi_ = lo[:, None], hi[:, None]                    # [B, 1]
    need_prefill = b_start < prefill_len
    wrap = lo_ > hi_
    ov_main = (b_start < hi_) & (b_end > lo_)              # [lo, hi)
    ov_wrap = (b_start < hi_) | (b_end > lo_)              # [.., hi) U [lo, ..)
    return need_prefill | jnp.where(wrap, ov_wrap, ov_main)


def _call(q, k, v, needed, mask, *, block_s: int, interpret: bool):
    B, n_heads, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_heads // n_kv
    if S % block_s:
        # compat/testing path only: the production cache is always
        # block-aligned (required_ctx aligns to 128) — padding copies it.
        pad = block_s - S % block_s
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        S += pad
    kf = k.reshape(B, S, n_kv * D)
    vf = v.reshape(B, S, n_kv * D)
    # mask rows grouped per block, flattened 2-D [B*NB_total, bs]
    # (Mosaic: dynamic-row gathers must be 2-D). int32, not int8 — dynamic
    # sublane indices on i8 must be multiples of 4.
    nb_total = S // block_s
    mask_b = mask.astype(jnp.int32).reshape(B * nb_total, block_s)

    seg, entry_b, entry_blk = _schedule(needed)
    n_entries = int(entry_b.shape[0])

    # Pre-scaled block-diagonal q fold [B, n_heads, kvD]: head row
    # h*G+g holds q_{h,g} at cols h*D:(h+1)*D and zeros elsewhere, so one
    # [bs,kvD]x[n_heads,kvD]^T dot in the kernel scores ALL heads of a
    # stream at once. Heads-major keeps the minor dim lane-sized.
    scale = 1.0 / (D ** 0.5)
    qg = (q.astype(jnp.float32) * scale).reshape(B, n_kv, G, D)
    eye = jnp.eye(n_kv, dtype=jnp.float32)
    qd = jnp.einsum("bhgd,hk->bhgkd", qg, eye).reshape(
        B, n_kv * G, n_kv * D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, block_s, n_kv * D), k.dtype),  # K buffers
            pltpu.VMEM((N_BUF, block_s, n_kv * D), v.dtype),  # V buffers
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    kv_bytes = (2 * n_entries * block_s * n_kv * D *
                jnp.dtype(k.dtype).itemsize)
    out = pl.pallas_call(
        functools.partial(_kernel, block_s=block_s, n_kv=n_kv, G=G, D=D,
                          B=B, NB=nb_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_heads, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_entries * n_heads * block_s * D,
            bytes_accessed=int(kv_bytes), transcendentals=0),
        interpret=interpret,
    )(seg, entry_b, entry_blk, qd, mask_b, kf, vf)
    return out.reshape(B, n_heads * D)


@functools.partial(jax.jit, static_argnames=("read_ctx", "block_s",
                                             "interpret"))
def flash_decode(q: jax.Array, k: jax.Array, v: jax.Array,
                 n_valid: jax.Array, *, read_ctx: int | None = None,
                 block_s: int = DEFAULT_BLOCK,
                 interpret: bool = False) -> jax.Array:
    """Prefix-validity decode attention (lock-step batches).

    q: [B, n_heads, D]; k, v: [B, S, n_kv, D] FULL padded cache (no
    slicing/copying — the schedule bounds reads); n_valid: [B] int32.
    read_ctx (static): upper bound on any stream's valid length.
    Returns [B, n_heads*D] f32."""
    S = k.shape[1]
    block_s = _pick_block(S, block_s)
    ctx = min(read_ctx or S, S)
    n_blocks = -(-ctx // block_s)
    needed = _prefix_needed(n_valid.astype(jnp.int32), n_blocks, block_s)
    mask = jnp.arange(S, dtype=jnp.int32)[None, :] < n_valid[:, None]
    return _call(q, k, v, needed, mask, block_s=block_s,
                 interpret=interpret)


@functools.partial(jax.jit, static_argnames=("read_ctx", "prefill_len",
                                             "block_s", "interpret"))
def flash_decode_masked(q: jax.Array, k: jax.Array, v: jax.Array,
                        valid_mask: jax.Array, *,
                        window_lo: jax.Array | None = None,
                        window_hi: jax.Array | None = None,
                        prefill_len: int = 0,
                        read_ctx: int | None = None,
                        block_s: int = DEFAULT_BLOCK,
                        interpret: bool = False) -> jax.Array:
    """Bitmask decode attention for the ring-slot cache (serving).

    valid_mask: [B, S] bool — slots each stream may attend.
    window_lo/hi: optional per-stream ring window [lo, hi) (hi may be a
    scalar); with prefill_len, bounds which blocks are fetched at all —
    HBM traffic then tracks each stream's lifetime, not the global ring
    coverage. Without a window, all blocks under read_ctx are visited.
    """
    B = q.shape[0]
    S = k.shape[1]
    block_s = _pick_block(S, block_s)
    ctx = min(read_ctx or S, S)
    n_blocks = -(-ctx // block_s)
    if (window_lo is None) != (window_hi is None):
        raise ValueError("window_lo and window_hi must be given together")
    if window_lo is not None:
        lo = jnp.broadcast_to(window_lo.astype(jnp.int32), (B,))
        hi = jnp.broadcast_to(jnp.asarray(window_hi, jnp.int32), (B,))
        needed = _window_needed(n_blocks, block_s, prefill_len, lo, hi)
    else:
        needed = jnp.ones((B, n_blocks), bool)
    return _call(q, k, v, needed, valid_mask, block_s=block_s,
                 interpret=interpret)
