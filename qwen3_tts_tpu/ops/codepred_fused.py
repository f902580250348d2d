"""Code-predictor megakernel: all 16 AR steps in ONE Pallas program.

TPU-native mirror of the reference's TensorRT code-pred fast path
(trt_code_predictor.cpp:484-726): where the reference chains 16 TRT
enqueues + cuBLAS lm_head + on-GPU sampling with a single stream sync,
this kernel runs the whole frame — 16 sequential positions through the
5 shared layers, attention over the in-flight 16-slot KV cache, the
per-step lm_head, temperature/top-k/Gumbel sampling and the embedding
feedback — inside one `pallas_call`, with zero dispatches in between.

Why: the XLA lowering of this stage is LATENCY-bound, not bandwidth
bound.  Each frame is 16 x 5 x 4 = 320 small sequential matmuls
(M = batch, K/N ~1024-6144); tools/bench_codepred.py measures the bare
XLA matmul chain at 7.9 ms/frame at B=64 against a ~3.1 ms HBM floor
(16 steps x ~157 MB of bf16 weights at ~800 GB/s).  Per-op dispatch
cannot prefetch the next op's weights, so every matmul eats an HBM
latency bubble.  Here a single DMA pipeline streams all 80 weight tiles
of a step through an 8-deep VMEM ring, double-buffered against the MXU,
so the weight stream never stalls:

  HBM tile j+7 --DMA--> VMEM ring | MXU consumes tile j | VPU: attention,
                                  |                     | sampling of the
                                  |                     | previous tiles

Key design points
- 16 uniform single-token steps: the XLA path's 2-token prefill is
  algebraically identical to two single-token steps (position 0 output
  is discarded; its K/V row is kept), so the kernel runs positions
  0..15 through one identical body (lax.fori_loop, compiled once).
- KV cache (5 layers x 16 slots) lives ENTIRELY in VMEM scratch
  (B*320 KB; ~61 MB at B=192) — no KV traffic to HBM at all.
- GQA q-head order is pre-permuted OUTSIDE the kernel (g-major:
  h' = g*8 + kv) so `pltpu.repeat` (tile semantics) replicates K/V rows
  into exactly the right head alignment; wo rows are permuted to match,
  so results are bit-identical to the natural order.
- Sampling matches ops/sampling.sample_codes semantics exactly in
  distribution: temperature scale, top-k with ties-at-threshold kept
  (the k-th largest logit is found EXACTLY by a 32-step binary search
  in monotone-mapped uint32 bit space), then a Gumbel-argmax draw
  (categorical(logits) == argmax(logits + gumbel)).  The Gumbel noise
  is precomputed outside from the caller's PRNG key, so the kernel is
  deterministic given the key (the sampled stream differs from the XLA
  path's categorical stream, same law; greedy mode is exact argmax).
- Garbage never propagates: K/V slots beyond the current position are
  masked AFTER the product (select discards NaN/Inf from uninitialized
  scratch), and the slot-p row is written before it is read.

Weight bytes per frame: 16 steps x (150 MB layers + 4 MB head + 4 MB
table + 2 MB dummy) ~= 2.56 GB -> ~3.2 ms at v5e HBM speed-of-light;
measured numbers in NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024          # K/N dimension of one streamed weight tile
CTX = 16             # positions per frame (1 hidden + 1 cb0 + 14 codes)
NEG = -1.0e30        # finite -inf stand-in (avoids NaN via inf-inf)

# Max batch for a single kernel invocation: past this the VMEM KV
# scratch (B * 320 KB) + transients no longer fit next to the tile ring;
# predict_codes_fused splits larger batches into sequential halves.
MAX_SINGLE_B = 192


def _nbuf(B: int) -> int:
    """Weight-tile ring depth: 8 (16 MB) while VMEM allows, 4 (8 MB)
    at B=192 where the KV scratch (61 MB) crowds it out."""
    return 8 if B <= 160 else 4

# Reference code-predictor architecture this kernel is specialized to
# (tts_transformer.h:43-49; anything else falls back to the XLA path).
H, NH, NKV, D, I, V = 1024, 16, 8, 128, 3072, 2048
NQ = NH * D          # 2048
L_DEFAULT = 5

# Tiles per step: 2 table (K) + per layer [4 qkv (N), 2 wo (K),
# 3 gate (N), 3x(up (N) + down (K))] + 2 head (N) + 1 dummy = 80.
_LAYER_TILES = 15


def vmem_bytes(B: int, n_layers: int = L_DEFAULT) -> int:
    """Static VMEM budget estimate for the kernel at batch B."""
    ring = _nbuf(B) * TILE * TILE * 2
    kv = 2 * n_layers * CTX * B * NKV * D * 2
    gumbel = B * V * 4
    transients = B * (4 * NQ + 2 * I + 4 * V + 8 * H) * 4   # rough
    return ring + kv + gumbel + transients


def _fits(B: int, n_layers: int) -> bool:
    return B % 8 == 0 and vmem_bytes(B, n_layers) < 100 * 1024 * 1024


def supported(cfg, B: int, w) -> bool:
    """Kernel preconditions: reference dims, fused wqkv layout (tp=1),
    no mtp projection (0.6B), batch multiple of 8, VMEM fit — either
    directly or as two sequential halves (MAX_SINGLE_B < B <= 2x).

    The layer count must be exactly L_DEFAULT: the weight-DMA ring is
    race-free only when NT = 2 + 15*L + 3 tiles/step is a multiple of
    the ring depth (8 and 4 both divide 80 at L=5; no other L works —
    a wrapping prefetch would otherwise start a DMA into a buffer whose
    previous transfer is still in flight)."""
    cp = w["code_pred"]
    L = cfg.code_pred_layers
    lw = cp["layers"]
    # The streamed weights are DMA'd into bf16 VMEM ring buffers; any
    # other dtype (e.g. a stack loaded with MATMUL_DTYPE=float32, as
    # tools/parity.py uses) would hit a Mosaic DMA dtype mismatch —
    # gate it here so the auto path cleanly falls back to XLA instead.
    streamed_bf16 = "wqkv" in lw and all(
        lw[name].dtype == jnp.bfloat16
        for name in ("wqkv", "wo", "w_gu", "w_down"))
    return (
        cp.get("mtp_w") is None
        and streamed_bf16
        and L == L_DEFAULT
        and cfg.code_pred_hidden_size == H
        and cfg.code_pred_n_attention_heads == NH
        and cfg.code_pred_n_kv_heads == NKV
        and cfg.code_pred_head_dim == D
        and cfg.code_pred_intermediate_size == I
        and cfg.code_pred_vocab_size == V
        and cfg.n_codebooks == CTX
        and (_fits(B, L) if B <= MAX_SINGLE_B
             else (B % 16 == 0 and B <= 2 * MAX_SINGLE_B
                   and _fits(B // 2, L)))
    )


def _permute_gqa_weights(wqkv: jax.Array, wo: jax.Array):
    """Reorder q heads kv-pair-major -> g-major (h' = g*NKV + kv).

    `pltpu.repeat(k, G, axis=heads)` tiles [k0..k7,k0..k7], i.e. kernel
    head h' reads kv head h' % NKV.  The natural Qwen order is
    h = kv*G + g, so we permute the q columns of wqkv (and the matching
    wo rows) once outside the kernel; the composition is exact."""
    L = wqkv.shape[0]
    G = NH // NKV
    q = wqkv[:, :, :NQ].reshape(L, H, NKV, G, D)
    q = q.transpose(0, 1, 3, 2, 4).reshape(L, H, NQ)
    wqkv_p = jnp.concatenate([q, wqkv[:, :, NQ:]], axis=2)
    r = wo[:, :NQ, :].reshape(L, NKV, G, D, H)
    wo_p = r.transpose(0, 2, 1, 3, 4).reshape(L, NQ, H)
    return wqkv_p, wo_p


def _rope_tables(theta: float):
    """[CTX, D] cos/sin rows; sin row carries the NEOX rotate-half sign:
    out = x * c + roll(x, D/2) * s  with  c = [cos|cos], s = [-sin|sin]."""
    half = D // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-2.0 / D) * jnp.log(jnp.float32(theta)))
    ang = jnp.arange(CTX, dtype=jnp.float32)[:, None] * freqs[None, :]
    c = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=1)
    s = jnp.concatenate([-jnp.sin(ang), jnp.sin(ang)], axis=1)
    return c, s


def _first_argmax(y: jax.Array) -> jax.Array:
    """[B, V] -> [B, 1] int32 index of the first maximum (matches
    jnp.argmax / the reference's linear scan, tts_transformer.cpp:2051)."""
    B = y.shape[0]
    m = jnp.max(y, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    return jnp.min(jnp.where(y >= m, iota, V), axis=1, keepdims=True)


def _kth_threshold_mask(z: jax.Array, k: int) -> jax.Array:
    """Exact top-k mask with ties-at-threshold kept (the
    ops/sampling.apply_top_k semantics): binary search for the k-th
    largest value in monotone uint32 bit space, then z >= that value."""
    B = z.shape[0]
    u = pltpu.bitcast(z, jnp.uint32)
    us = jnp.where(z >= 0, u | jnp.uint32(0x80000000), ~u)
    t = jnp.zeros((B, 1), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = t | jnp.uint32(1 << bit)
        cnt = jnp.sum((us >= cand).astype(jnp.int32), axis=1, keepdims=True)
        t = jnp.where(cnt >= k, cand, t)
    return us >= t


def _make_kernel(B: int, n_layers: int, eps: float, greedy: bool,
                 top_k: int):
    """Build the kernel body (python-staged; the 16-step loop is a
    lax.fori_loop, the 5-layer and 80-tile loops are unrolled)."""
    NT = 2 + n_layers * _LAYER_TILES + 2 + 1    # tiles per step (80)
    NBUF = _nbuf(B)

    def kernel(xs_ref, wqkv_ref, wo_ref, wgu_ref, wdown_ref, heads_ref,
               tables_ref, attn_norm_ref, ffn_norm_ref, q_norm_ref,
               k_norm_ref, out_norm_ref, rope_c_ref, rope_s_ref,
               gumbel_ref, tinv_ref, tle0_ref,
               codes_ref,
               wbufs, wsems, kv_k, kv_v, code_buf, gbuf, gsem):

        # ---- weight-tile DMA schedule (entry index -> HBM source) ----
        # Every tile is a CONTIGUOUS [TILE, TILE] block: the N-sliced
        # matrices (wqkv/w_gu/heads) are pre-tiled outside the kernel
        # into [..., n_tiles, K, TILE] — a column-sliced DMA would move
        # 1024 strided 2 KB segments and run far below HBM speed.
        def entry_src(i, pp):
            te = jnp.clip(pp - 2, 0, CTX - 3)     # table index for step pp
            he = jnp.clip(pp - 1, 0, CTX - 2)     # head index
            if i == 0:
                return tables_ref.at[te, pl.ds(0, TILE), :]
            if i == 1:
                return tables_ref.at[te, pl.ds(TILE, TILE), :]
            j = i - 2
            if j < n_layers * _LAYER_TILES:
                l, r = divmod(j, _LAYER_TILES)
                if r < 4:                          # qkv N-tiles
                    return wqkv_ref.at[l, r]
                if r < 6:                          # wo K-tiles
                    return wo_ref.at[l, pl.ds((r - 4) * TILE, TILE), :]
                if r < 9:                          # gate N-tiles
                    return wgu_ref.at[l, r - 6]
                m, q = divmod(r - 9, 2)            # up/down interleaved
                if q == 0:
                    return wgu_ref.at[l, 3 + m]
                return wdown_ref.at[l, pl.ds(m * TILE, TILE), :]
            j -= n_layers * _LAYER_TILES
            if j == 0:
                return heads_ref.at[he, 0]
            if j == 1:
                return heads_ref.at[he, 1]
            return wo_ref.at[0, pl.ds(0, TILE), :]   # dummy keeps NT%NBUF==0

        def dma(i, pp):
            return pltpu.make_async_copy(
                entry_src(i, pp), wbufs.at[i % NBUF], wsems.at[i % NBUF])

        def take(i, pp):
            """Wait tile i of step pp; keep the ring NBUF-1 deep by
            starting the tile NBUF-1 ahead (wrapping into step pp+1)."""
            dma(i, pp).wait()
            j = i + NBUF - 1
            if j < NT:
                dma(j, pp).start()
            else:
                dma(j - NT, pp + 1).start()
            return wbufs[i % NBUF]

        def rms(x, w_row):                         # x [B,H] f32, w [1,H]
            ms = jnp.mean(x * x, axis=1, keepdims=True)
            return (x * jax.lax.rsqrt(ms + eps)) * w_row

        def head_norm(x3, w_row):                  # x3 [B,h,D], w [1,D]
            ms = jnp.mean(x3 * x3, axis=2, keepdims=True)
            return (x3 * jax.lax.rsqrt(ms + eps)) * w_row[None]

        def body(p, _):
            if not greedy:
                g_dma = pltpu.make_async_copy(
                    gumbel_ref.at[jnp.clip(p - 1, 0, CTX - 2)], gbuf, gsem)
                g_dma.start()

            c_row = rope_c_ref[pl.ds(p, 1), :]     # [1, D]
            s_row = rope_s_ref[pl.ds(p, 1), :]

            # ---- input embedding: one-hot(code_{p-1}) @ table[p-2] ----
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
            oh = (iota_v == code_buf[:, :]).astype(jnp.bfloat16)
            t0 = take(0, p)
            x_emb = jnp.dot(oh[:, :TILE], t0,
                            preferred_element_type=jnp.float32)
            t1 = take(1, p)
            x_emb = x_emb + jnp.dot(oh[:, TILE:], t1,
                                    preferred_element_type=jnp.float32)
            x = jnp.where(p == 0, xs_ref[0],
                          jnp.where(p == 1, xs_ref[1], x_emb))

            base = 2
            for l in range(n_layers):
                # ---- attention ----
                xn = rms(x, attn_norm_ref[pl.ds(l, 1), :]).astype(jnp.bfloat16)
                qa = jnp.dot(xn, take(base + 0, p),
                             preferred_element_type=jnp.float32)
                qb = jnp.dot(xn, take(base + 1, p),
                             preferred_element_type=jnp.float32)
                kk = jnp.dot(xn, take(base + 2, p),
                             preferred_element_type=jnp.float32)
                vv = jnp.dot(xn, take(base + 3, p),
                             preferred_element_type=jnp.float32)
                q3 = jnp.concatenate(
                    [qa.reshape(B, NKV, D), qb.reshape(B, NKV, D)], axis=1)
                k3 = kk.reshape(B, NKV, D)
                q3 = head_norm(q3, q_norm_ref[pl.ds(l, 1), :])
                k3 = head_norm(k3, k_norm_ref[pl.ds(l, 1), :])
                q3 = q3 * c_row[None] + pltpu.roll(q3, shift=D // 2,
                                                   axis=2) * s_row[None]
                k3 = k3 * c_row[None] + pltpu.roll(k3, shift=D // 2,
                                                   axis=2) * s_row[None]
                kv_k[l, pl.ds(p, 1)] = k3.astype(jnp.bfloat16).reshape(
                    1, B, NKV, D)
                kv_v[l, pl.ds(p, 1)] = vv.astype(jnp.bfloat16).reshape(
                    1, B, NKV, D)

                q3 = q3 * (D ** -0.5)
                scores = []
                for s_i in range(CTX):
                    krep = pltpu.repeat(
                        kv_k[l, s_i].astype(jnp.float32), NH // NKV, axis=1)
                    sc = jnp.sum(q3 * krep, axis=2)          # [B, NH]
                    # select AFTER compute: garbage K in future slots
                    # (NaN/Inf from uninitialized scratch) is discarded
                    scores.append(jnp.where(s_i <= p, sc, NEG))
                m = functools.reduce(jnp.maximum, scores)
                es = [jnp.exp(sc - m) for sc in scores]
                den = functools.reduce(jnp.add, es)
                acc = jnp.zeros((B, NH, D), jnp.float32)
                for s_i in range(CTX):
                    vrep = pltpu.repeat(
                        kv_v[l, s_i].astype(jnp.float32), NH // NKV, axis=1)
                    acc = acc + jnp.where(s_i <= p,
                                          es[s_i][:, :, None] * vrep, 0.0)
                attn = (acc / den[:, :, None]).astype(jnp.bfloat16)

                o = jnp.dot(attn[:, :NKV, :].reshape(B, TILE),
                            take(base + 4, p),
                            preferred_element_type=jnp.float32)
                o = o + jnp.dot(attn[:, NKV:, :].reshape(B, TILE),
                                take(base + 5, p),
                                preferred_element_type=jnp.float32)
                x = x + o

                # ---- SwiGLU FFN (gate tiles, then up/down pairs) ----
                hn = rms(x, ffn_norm_ref[pl.ds(l, 1), :]).astype(jnp.bfloat16)
                gates = [jnp.dot(hn, take(base + 6 + j, p),
                                 preferred_element_type=jnp.float32)
                         for j in range(3)]
                ff = jnp.zeros((B, H), jnp.float32)
                for j in range(3):
                    up = jnp.dot(hn, take(base + 9 + 2 * j, p),
                                 preferred_element_type=jnp.float32)
                    act = (jax.nn.silu(gates[j]) * up).astype(jnp.bfloat16)
                    ff = ff + jnp.dot(act, take(base + 10 + 2 * j, p),
                                      preferred_element_type=jnp.float32)
                x = x + ff
                base += _LAYER_TILES

            # ---- lm_head + sampling ----
            h = rms(x, out_norm_ref[:, :]).astype(jnp.bfloat16)
            lo0 = jnp.dot(h, take(base, p),
                          preferred_element_type=jnp.float32)
            lo1 = jnp.dot(h, take(base + 1, p),
                          preferred_element_type=jnp.float32)
            logits = jnp.concatenate([lo0, lo1], axis=1)     # [B, V]
            take(base + 2, p)                                # dummy tile

            if greedy:
                code = _first_argmax(logits)
            else:
                z = logits * tinv_ref[0, 0]
                if 0 < top_k < V:
                    mask = _kth_threshold_mask(z, top_k)
                    z_m = jnp.where(mask, z, NEG)
                else:
                    z_m = z
                g_dma.wait()
                code_s = _first_argmax(z_m + gbuf[:, :])
                code_g = _first_argmax(logits)
                code = jnp.where(tle0_ref[0, 0] != 0, code_g, code_s)

            # Mosaic cannot store at a dynamic LANE offset; write the
            # [B, CTX] row via a masked read-modify-write instead.
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (B, CTX), 1)
            codes_ref[:, :] = jnp.where(iota_c == p, code, codes_ref[:, :])
            code_buf[:, :] = code
            return 0

        # prime the ring, run the 16 steps, drain the tail prefetches
        for i in range(NBUF - 1):
            dma(i, jnp.int32(0)).start()
        jax.lax.fori_loop(0, CTX, body, 0)
        for i in range(NBUF - 1):
            dma(i, jnp.int32(CTX)).wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(B: int, n_layers: int, eps: float, greedy: bool,
                top_k: int, interpret: bool):
    kernel = _make_kernel(B, n_layers, eps, greedy, top_k)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, CTX), jnp.int32),
        in_specs=[
            vmem,                      # xs [2, B, H] f32
            any_spec, any_spec, any_spec, any_spec,   # wqkv wo wgu wdown
            any_spec, any_spec,        # heads, tables
            vmem, vmem, vmem, vmem, vmem,   # norms
            vmem, vmem,                # rope c/s
            any_spec,                  # gumbel
            smem, smem,                # tinv, tle0
        ],
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((_nbuf(B), TILE, TILE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_nbuf(B),)),
            pltpu.VMEM((n_layers, CTX, B, NKV, D), jnp.bfloat16),
            pltpu.VMEM((n_layers, CTX, B, NKV, D), jnp.bfloat16),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, V), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )


def predict_codes_fused(w, cfg, hidden: jax.Array, cb0: jax.Array,
                        temperature: jax.Array, top_k: int, key: jax.Array,
                        greedy: bool = False,
                        interpret: bool = False) -> jax.Array:
    """Drop-in replacement for models/code_predictor.predict_codes.

    hidden: [B, H] f32; cb0: [B] int32 -> codes [B, 15] int32.
    Greedy mode matches the XLA path's argmax chain (up to bf16 matmul
    associativity); sampled mode draws from the identical distribution
    via Gumbel-argmax with noise derived from `key`.
    """
    cp = w["code_pred"]
    B = hidden.shape[0]
    if B > MAX_SINGLE_B:
        # two sequential half-batch kernel invocations (VMEM KV scratch
        # is B-proportional); the sampled stream differs from the unsplit
        # kernel's (independent sub-keys) but the law is identical.
        half = B // 2
        k1, k2 = jax.random.split(key)
        lo = predict_codes_fused(w, cfg, hidden[:half], cb0[:half],
                                 temperature, top_k, k1, greedy=greedy,
                                 interpret=interpret)
        hi = predict_codes_fused(w, cfg, hidden[half:], cb0[half:],
                                 temperature, top_k, k2, greedy=greedy,
                                 interpret=interpret)
        return jnp.concatenate([lo, hi], axis=0)
    lw = cp["layers"]
    wqkv_p, wo_p = _permute_gqa_weights(lw["wqkv"], lw["wo"])
    L = wqkv_p.shape[0]
    # Pre-tile the N-sliced matrices so every kernel DMA is contiguous
    # (see entry_src).  These transposes sit OUTSIDE the frame scan and
    # are hoisted by XLA's loop-invariant code motion.
    wqkv_t = wqkv_p.reshape(L, H, 4, TILE).transpose(0, 2, 1, 3)
    wgu_t = lw["w_gu"].reshape(L, H, 6, TILE).transpose(0, 2, 1, 3)
    heads_t = cp["heads"].astype(jnp.bfloat16).reshape(
        CTX - 1, H, 2, TILE).transpose(0, 2, 1, 3)
    rope_c, rope_s = _rope_tables(cfg.rope_theta)

    xs = jnp.stack([hidden.astype(jnp.float32),
                    jnp.take(w["codec_embd"], cb0, axis=0)
                    .astype(jnp.float32)], axis=0)
    if greedy:
        gumbel = jnp.zeros((1, 8, 128), jnp.float32)
    else:
        gumbel = jax.random.gumbel(key, (CTX - 1, B, V), jnp.float32)
    tinv = (1.0 / jnp.maximum(temperature, 1e-6)).astype(
        jnp.float32).reshape(1, 1)
    tle0 = (temperature <= 0.0).astype(jnp.int32).reshape(1, 1)

    call = _build_call(B, cfg.code_pred_layers, float(cfg.rms_norm_eps),
                       bool(greedy), int(top_k), bool(interpret))
    codes = call(
        xs, wqkv_t, wo_p, wgu_t, lw["w_down"],
        heads_t, cp["embd"].astype(jnp.bfloat16),
        lw["attn_norm"].astype(jnp.float32),
        lw["ffn_norm"].astype(jnp.float32),
        lw["q_norm"].astype(jnp.float32), lw["k_norm"].astype(jnp.float32),
        cp["output_norm"].astype(jnp.float32).reshape(1, H),
        rope_c, rope_s, gumbel, tinv, tle0)
    return codes[:, 1:]
