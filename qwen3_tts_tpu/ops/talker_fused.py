"""Talker decode-step megakernel: all 28 layers in ONE Pallas program.

TPU-native counterpart of the reference's per-frame step graph
(build_step_graph, tts_transformer.cpp:1376-1512) for LOCK-STEP batches,
fusing the whole single-token stack — per-layer RMSNorm, QKV, q/k head
norm + NEOX RoPE, the KV-cache row write, blocked decode attention over
the HBM cache, the output projection and the SwiGLU FFN — into a single
`pallas_call`, mirrored on the code-predictor megakernel
(ops/codepred_fused.py) whose layer dims the talker shares exactly.

Why: the XLA lowering pays an HBM latency bubble per weight matrix
(28 x 4 sequential matmuls on [B, 1024] activations can't prefetch the
next op's weights) and, with the stacked cache layout, materializes
multi-hundred-MB per-layer cache slices (NOTES.md round 3: 19.2 ms/frame
at B=192 vs a ~3 ms floor).  Here one DMA ring streams all 16 weight
tiles per layer double-buffered against the MXU, and attention reads the
cache via explicit block DMAs — the layout can stay stacked because the
kernel never asks XLA to slice it.

Design
- Weight stream: 15 real tiles/layer in the codepred layout (4 qkv
  N-tiles, 2 wo K-tiles, 3 gate N-tiles, 3x(up N + down K)) + 1 dummy so
  the per-layer count (16) is a multiple of the ring depth — the same
  race-free wrap rule as codepred_fused (NT % NBUF == 0).  N-sliced
  matrices (wqkv, w_gu) are pre-tiled outside the kernel into contiguous
  [L, n, H, H] blocks; K-sliced ones (wo, w_down) DMA directly from the
  natural layout.
- Attention: per (stream-tile, seq-block), K/V blocks are DMA'd from the
  HBM cache ([TB, kv, bs, D] slices, contiguous bs*D runs) and scored
  with the block-diagonal GQA fold of ops/flash_decode.py — one
  [bs, kv*D] x [kv*D, n_heads] MXU dot scores ALL heads of a stream —
  with online softmax carried in registers across blocks.
- The CURRENT token's K/V row never round-trips through HBM: its
  attention contribution is computed analytically in VMEM (the row is
  masked out of every block read), and the rows leave the kernel as
  [L, B, kv, D] outputs that the wrapper merges into the cache with ONE
  dynamic_update_slice over all layers (an in-kernel 1-row DMA into the
  [.., S, D] cache is not tile-aligned on S — Mosaic rejects the memref
  slice).  For the int8 cache the row is quantize->dequantized first, so
  the math matches the XLA path, which reads its own row back quantized.
- int8 cache: block scores are computed on the RAW int8 values (exact in
  bf16) and the per-row scales are applied AFTER the dot — exact, because
  the block-diagonal fold keeps each kv head's contribution separate;
  V scales fold into the probabilities the same way.

Supported: the reference talker geometry only (tts_transformer.h:21-35 —
NKV*D == H, NH == 2*NKV, I == 3*H), fused wqkv weights (tp=1), lock-step
scalar write slot with prefix validity, stacked (non-layered) cache.
Anything else falls back to the XLA stack_step.

Run on CPU via interpret mode (tests); compiled Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30          # finite -inf stand-in (avoids NaN via inf-inf)
N_BUF_W = 8            # weight-tile ring depth (16 MB at H=1024)
N_BUF_KV = 2           # K/V block double buffers
TILES_PER_LAYER = 16   # 15 real + 1 dummy (keeps NT % N_BUF_W == 0)
BLOCK_S = 128          # cache seq-block (every read_ctx bucket divides)


def _tb_for(B: int) -> int:
    """Stream tile for attention: 32 keeps the K/V block buffers at
    2 x 2 x [32, 8, 128, 128] (17-34 MB) next to the 16 MB weight ring;
    small (test) batches run as one tile."""
    return 32 if B % 32 == 0 else B


def _geometry_ok(cfg) -> bool:
    """The codepred-tile weight layout requires the reference ratios."""
    H, NH, NKV, D, I = (cfg.hidden_size, cfg.n_attention_heads,
                        cfg.n_key_value_heads, cfg.head_dim,
                        cfg.intermediate_size)
    return NKV * D == H and NH == 2 * NKV and I == 3 * H


def vmem_bytes(cfg, B: int, quant: bool) -> int:
    """Static VMEM budget estimate at batch B."""
    H, D, NKV = cfg.hidden_size, cfg.head_dim, cfg.n_key_value_heads
    NH = cfg.n_attention_heads
    TB = _tb_for(B)
    ring = N_BUF_W * H * H * 2
    kv_elem = 1 if quant else 2
    kvbuf = 2 * N_BUF_KV * TB * NKV * BLOCK_S * D * kv_elem
    scales = (2 * N_BUF_KV * TB * NKV * BLOCK_S * 4) if quant else 0
    attn = B * NH * D * 4
    x = B * H * 4
    # [L, B, kv, D] current-row outputs (k + v, + f32 scales when
    # quantized; scale lanes pad kv=8 -> 128)
    L = getattr(cfg, "n_layers", 28)
    rows_out = 2 * L * B * NKV * D * kv_elem
    rows_out += (2 * L * B * 128 * 4) if quant else 0
    transients = B * (6 * H) * 4 + TB * BLOCK_S * H * 2   # rough
    return ring + kvbuf + scales + attn + x + rows_out + transients


def supported(cfg, B: int, w, kv_cache, write_idx, valid_mask,
              read_ctx: int | None) -> bool:
    """Kernel preconditions; callers fall back to the XLA stack_step."""
    from ..models.stack import QuantKV, is_layered
    lw = w["layers"] if "layers" in w else w
    if is_layered(kv_cache):
        return False
    quant = isinstance(kv_cache, QuantKV)
    vals = kv_cache.values if quant else kv_cache
    S = vals.shape[4]
    streamed_bf16 = "wqkv" in lw and all(
        lw[name].dtype == jnp.bfloat16
        for name in ("wqkv", "wo", "w_gu", "w_down"))
    rc = S if read_ctx is None else read_ctx
    mask_ok = valid_mask is None or (
        getattr(valid_mask, "ndim", 0) == 2
        and valid_mask.shape[1] == S)                # ring bitmask mode
    return (
        _geometry_ok(cfg)
        and streamed_bf16
        and mask_ok
        and getattr(write_idx, "ndim", 0) == 0       # shared write slot
        and B % _tb_for(B) == 0
        and S % BLOCK_S == 0 and rc % BLOCK_S == 0 and rc <= S
        and vmem_bytes(cfg, B, quant) < 100 * 1024 * 1024
    )


def _rope_rows(positions: jax.Array, D: int, theta: float):
    """Per-stream NEOX rope rows: c=[cos|cos], s=[-sin|sin] ([B, D])."""
    half = D // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-2.0 / D) * jnp.log(jnp.float32(theta)))
    ang = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    c = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=1)
    s = jnp.concatenate([-jnp.sin(ang), jnp.sin(ang)], axis=1)
    return c, s


def _make_kernel(*, B: int, L: int, S: int, H: int, NH: int, NKV: int,
                 D: int, eps: float, n_blocks: int, quant: bool,
                 masked: bool):
    """Kernel body builder. Layers run in a fori_loop (dynamic l); the
    16 weight tiles, B//TB stream tiles and n_blocks seq blocks per layer
    are python-unrolled (static structure, required for the DMA ring)."""
    G = NH // NKV
    NT = TILES_PER_LAYER
    TB = _tb_for(B)
    n_tiles = B // TB
    E = n_tiles * n_blocks        # KV fetch entries per layer

    def kernel(x_ref, rope_c_ref, rope_s_ref, val_ref, live_ref,
               widx_ref, wqkv_ref, wo_ref, wgu_ref, wdown_ref,
               attn_norm_ref, ffn_norm_ref, q_norm_ref, k_norm_ref,
               # the cache is READ-only here; the current rows leave the
               # kernel as [L, B, kv, D] outputs and the caller merges
               # them with ONE dynamic_update_slice (a 1-row DMA write
               # into the [.., S, D] cache is not tile-aligned on S —
               # "Slice shape along dimension 4 must be aligned to
               # tiling (8)" — so in-kernel row writes cannot lower)
               *refs):
        if quant:
            (kvv_ref, kvs_ref, krows_ref, vrows_ref, ksc_ref, vsc_ref,
             y_ref, wbufs, wsems, kbuf, vbuf, ksbuf, vsbuf, kvsems,
             attn_buf) = refs
        else:
            (kvv_ref, krows_ref, vrows_ref, y_ref,
             wbufs, wsems, kbuf, vbuf, kvsems, attn_buf) = refs

        widx = widx_ref[0, 0]

        # ---- weight-tile ring (codepred_fused pattern) ---------------
        def w_src(l, j):
            if j < 4:
                return wqkv_ref.at[l, j]
            if j < 6:
                return wo_ref.at[l, pl.ds((j - 4) * H, H), :]
            if j < 9:
                return wgu_ref.at[l, j - 6]
            if j < 15:
                m, q = divmod(j - 9, 2)
                if q == 0:
                    return wgu_ref.at[l, 3 + m]
                return wdown_ref.at[l, pl.ds(m * H, H), :]
            return wo_ref.at[l, pl.ds(0, H), :]          # dummy tile

        def w_dma(l, j):
            t = l * NT + j
            return pltpu.make_async_copy(
                w_src(l, j), wbufs.at[jax.lax.rem(t, N_BUF_W)],
                wsems.at[jax.lax.rem(t, N_BUF_W)])

        def take(l, j):
            """Wait tile j of layer l; prefetch N_BUF_W-1 ahead
            (wrapping into layer l+1 — static j structure, NT % N_BUF_W
            == 0 keeps the wrap race-free as in codepred_fused)."""
            w_dma(l, j).wait()
            jj = j + N_BUF_W - 1
            if jj < NT:
                w_dma(l, jj).start()
            else:
                @pl.when(l + 1 < L)
                def _():
                    w_dma(l + 1, jj - NT).start()
            return wbufs[jax.lax.rem(l * NT + j, N_BUF_W)]

        # ---- K/V block fetches (double-buffered across entries) ------
        def kv_dma(l, e, slot):
            tb, blk = divmod(e, n_blocks)
            b0, s0 = tb * TB, blk * BLOCK_S
            ops = [
                pltpu.make_async_copy(
                    kvv_ref.at[l, 0, pl.ds(b0, TB), :, pl.ds(s0, BLOCK_S), :],
                    kbuf.at[slot], kvsems.at[slot, 0]),
                pltpu.make_async_copy(
                    kvv_ref.at[l, 1, pl.ds(b0, TB), :, pl.ds(s0, BLOCK_S), :],
                    vbuf.at[slot], kvsems.at[slot, 1]),
            ]
            if quant:
                ops += [
                    pltpu.make_async_copy(
                        kvs_ref.at[l, 0, pl.ds(b0, TB), :, pl.ds(s0, BLOCK_S)],
                        ksbuf.at[slot], kvsems.at[slot, 2]),
                    pltpu.make_async_copy(
                        kvs_ref.at[l, 1, pl.ds(b0, TB), :, pl.ds(s0, BLOCK_S)],
                        vsbuf.at[slot], kvsems.at[slot, 3]),
                ]
            return ops

        def kv_start(l, e, slot):
            for op in kv_dma(l, e, slot):
                op.start()

        def kv_take(l, e):
            """Wait entry e of layer l; prefetch entry e+1 (wrapping into
            layer l+1; E is even so the slot parity is stable)."""
            slot = jax.lax.rem(l * E + e, N_BUF_KV)
            nslot = jax.lax.rem(l * E + e + 1, N_BUF_KV)
            if e + 1 < E:
                kv_start(l, e + 1, nslot)
            else:
                @pl.when(l + 1 < L)
                def _():
                    kv_start(l + 1, 0, nslot)
            for op in kv_dma(l, e, slot):
                op.wait()
            return slot

        def rms(xv, w_row):                        # [B,H] f32, [1,H]
            ms = jnp.mean(xv * xv, axis=1, keepdims=True)
            return (xv * jax.lax.rsqrt(ms + eps)) * w_row

        def head_norm(x3, w_row):                  # [B,h,D], [1,D]
            ms = jnp.mean(x3 * x3, axis=2, keepdims=True)
            return (x3 * jax.lax.rsqrt(ms + eps)) * w_row[None]

        c_all = rope_c_ref[:, :]                   # [B, D]
        s_all = rope_s_ref[:, :]

        def quantize_row(r3):                      # [B, h, D] f32
            amax = jnp.max(jnp.abs(r3), axis=2, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            q = jnp.clip(jnp.round(r3 / scale), -127, 127)
            return q, scale                        # q f32-valued ints

        def body(l, x):
            # ---- QKV ----
            xn = rms(x, attn_norm_ref[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            qa = jnp.dot(xn, take(l, 0), preferred_element_type=jnp.float32)
            qb = jnp.dot(xn, take(l, 1), preferred_element_type=jnp.float32)
            kk = jnp.dot(xn, take(l, 2), preferred_element_type=jnp.float32)
            vv = jnp.dot(xn, take(l, 3), preferred_element_type=jnp.float32)
            q3 = jnp.concatenate(
                [qa.reshape(B, NKV, D), qb.reshape(B, NKV, D)], axis=1)
            k3 = kk.reshape(B, NKV, D)
            v3 = vv.reshape(B, NKV, D)
            q3 = head_norm(q3, q_norm_ref[pl.ds(l, 1), :])
            k3 = head_norm(k3, k_norm_ref[pl.ds(l, 1), :])
            q3 = q3 * c_all[:, None] + pltpu.roll(
                q3, shift=D // 2, axis=2) * s_all[:, None]
            k3 = k3 * c_all[:, None] + pltpu.roll(
                k3, shift=D // 2, axis=2) * s_all[:, None]

            # ---- current row -> [L, B, kv, D] outputs (the caller
            # merges all layers into the cache with one DUS)
            if quant:
                kq, kσ = quantize_row(k3)
                vq, vσ = quantize_row(v3)
                krows_ref[l] = kq.astype(jnp.int8)
                vrows_ref[l] = vq.astype(jnp.int8)
                ksc_ref[l] = kσ[:, :, 0]
                vsc_ref[l] = vσ[:, :, 0]
                # dequantized row for the analytic current-token term —
                # matches the XLA path, which reads its row back quantized
                k3c = kq * kσ
                v3c = vq * vσ
            else:
                krows_ref[l] = k3.astype(jnp.bfloat16)
                vrows_ref[l] = v3.astype(jnp.bfloat16)
                k3c = k3.astype(jnp.bfloat16).astype(jnp.float32)
                v3c = v3.astype(jnp.bfloat16).astype(jnp.float32)

            # ---- blocked attention (flash_decode's GQA fold) ----
            qs = q3 * (D ** -0.5)
            for tb in range(n_tiles):
                b0 = tb * TB
                qt = qs[b0:b0 + TB]                          # [TB, NH, D]
                # block-diagonal fold [TB, NH, NKV*D]: head row kv*G+g
                # holds q_{kv,g} at cols kv*D:(kv+1)*D. Built from
                # offset-0 strips: strip h = q rows whose kv head is h,
                # zeros elsewhere. The per-head zero-pad concat form
                # (slices of qt at differing non-concat-dim offsets)
                # fails Mosaic's concat lowering ("result/input offset
                # mismatch on non-concat dimension" — the vocoder
                # kernel's v1 lesson, NOTES.md round 2).
                kvid3 = (jax.lax.broadcasted_iota(
                    jnp.int32, (TB, NH, 1), 1) // G)
                qd = jnp.concatenate(
                    [jnp.where(kvid3 == h, qt, 0.0)
                     for h in range(NKV)],
                    axis=2).astype(jnp.bfloat16)             # [TB, NH, H]

                # Masks are built at their FINAL rank from the i32 rows:
                # Mosaic only supports minor-dim insertion (reshape /
                # [:, None]) on 32-bit types, so expanding a bool mask
                # after the compare fails to compile ("Insertion of
                # minor dim that is not a no-op only supported for
                # 32-bit types" — same pitfall as the flash kernel,
                # NOTES.md round 2).
                if not masked:
                    nv3 = val_ref[b0:b0 + TB, :][:, :, None]  # [TB,1,1] i32
                livei = live_ref[b0:b0 + TB, :]              # [TB, 1] i32
                live = livei != 0                            # [TB, 1]
                m = jnp.full((TB, 1, NH), NEG, jnp.float32)
                lsum = jnp.zeros((TB, 1, NH), jnp.float32)
                acc = jnp.zeros((TB, NH, D), jnp.float32)

                for blk in range(n_blocks):
                    slot = kv_take(l, tb * n_blocks + blk)
                    kfl = jnp.concatenate(
                        [kbuf[slot, :, h].astype(jnp.bfloat16)
                         for h in range(NKV)], axis=2)       # [TB, bs, H]
                    sc = jax.lax.dot_general(
                        kfl, qd, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [TB, bs, NH]
                    if quant:
                        kσt = ksbuf[slot]                    # [TB, kv, bs]
                        # static slice_in_dim + reshape, NOT kσt[:, h, :,
                        # None]: jnp lowers that indexing to a 3-D gather,
                        # which Mosaic rejects ("Only 2D gather") — the
                        # interpret-mode tests can't catch it (first
                        # on-chip compile did, r5)
                        sc = sc * jnp.concatenate(
                            [jnp.broadcast_to(
                                jax.lax.slice_in_dim(
                                    kσt, h, h + 1, axis=1
                                ).reshape(TB, BLOCK_S, 1),
                                (TB, BLOCK_S, G))
                             for h in range(NKV)], axis=2)
                    if masked:
                        # ring-slot bitmask; the wrapper already cleared
                        # bit widx (current row handled analytically).
                        # reshape BEFORE the compare: i32 minor-dim
                        # insert is supported, bool is not
                        mrow3 = (val_ref[b0:b0 + TB,
                                         blk * BLOCK_S:
                                         (blk + 1) * BLOCK_S]
                                 .reshape(TB, BLOCK_S, 1) != 0)
                    else:
                        s_iota3 = (blk * BLOCK_S
                                   + jax.lax.broadcasted_iota(
                                       jnp.int32, (TB, BLOCK_S, 1), 1))
                        mrow3 = (s_iota3 < nv3) & (s_iota3 != widx)
                    sc = jnp.where(mrow3, sc, NEG)
                    m_new = jnp.maximum(
                        m, jnp.max(sc, axis=1, keepdims=True))
                    p = jnp.exp(sc - m_new)
                    p = jnp.where(mrow3, p, 0.0)
                    alpha = jnp.exp(m - m_new)
                    # the softmax denominator sums the UNSCALED p; the
                    # V row scales fold only into the p @ V product
                    lsum = lsum * alpha + jnp.sum(p, axis=1, keepdims=True)
                    if quant:
                        vσt = vsbuf[slot]
                        # same static-slice form as the K scales above
                        # (3-D gather is unsupported in Mosaic)
                        p = p * jnp.concatenate(
                            [jnp.broadcast_to(
                                jax.lax.slice_in_dim(
                                    vσt, h, h + 1, axis=1
                                ).reshape(TB, BLOCK_S, 1),
                                (TB, BLOCK_S, G))
                             for h in range(NKV)], axis=2)
                    vfl = jnp.concatenate(
                        [vbuf[slot, :, h].astype(jnp.bfloat16)
                         for h in range(NKV)], axis=2)       # [TB, bs, H]
                    pv = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), vfl,
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [TB, NH, H]
                    # diagonal-block extraction as a masked accumulate
                    # over lane-aligned slices (the concat of slices at
                    # differing minor offsets does not lower in Mosaic;
                    # see the qd fold note above)
                    upd = jnp.zeros((TB, NH, D), jnp.float32)
                    for h in range(NKV):
                        upd = upd + jnp.where(
                            kvid3 == h,
                            pv[:, :, h * D:(h + 1) * D], 0.0)
                    acc = acc * alpha.transpose(0, 2, 1) + upd
                    m = m_new

                # current token (exact row the cache write carries).
                # Per-head terms accumulate under kvid3 strip masks —
                # NOT a concat of per-head slices: the slices carry
                # (sublane, lane) vreg offsets and Mosaic's concat
                # rejects offset-mismatched inputs (this exact site was
                # the compile failure: tpu.concatenate of 8 x
                # vector<32x2xf32> at offsets {0,0},{2,2},{4,4},...).
                # Arithmetic relayouts of offset operands ARE lowered,
                # so where()+add keeps exact f32 numerics.
                k3t = k3c[b0:b0 + TB]                        # [TB, kv, D]
                v3t = v3c[b0:b0 + TB]
                sc_cur2 = jnp.zeros((TB, NH), jnp.float32)
                for h in range(NKV):
                    sc_cur2 = sc_cur2 + jnp.sum(
                        jnp.where(kvid3 == h,
                                  qt * k3t[:, h:h + 1, :], 0.0), axis=2)
                sc_cur = jnp.where(live, sc_cur2, NEG)[:, None, :]
                m_new = jnp.maximum(m, sc_cur)
                # live3 from the i32 row (bool minor-dim insert would
                # not lower; see the mask note above)
                live3 = livei[:, :, None] != 0               # [TB, 1, 1]
                p_cur = jnp.where(live3, jnp.exp(sc_cur - m_new),
                                  0.0)                       # [TB, 1, NH]
                alpha = jnp.exp(m - m_new)
                lsum = lsum * alpha + p_cur
                pc = p_cur.transpose(0, 2, 1)                # [TB, NH, 1]
                acc = acc * alpha.transpose(0, 2, 1)
                for h in range(NKV):
                    acc = acc + jnp.where(
                        kvid3 == h, pc * v3t[:, h:h + 1, :], 0.0)
                out = acc / jnp.maximum(lsum.transpose(0, 2, 1), 1e-30)
                attn_buf[pl.ds(b0, TB), :] = out.reshape(
                    TB, NH * D).astype(jnp.bfloat16)

            # ---- output projection + FFN ----
            ab = attn_buf[:, :]                              # [B, NQ] bf16
            o = jnp.dot(ab[:, :H], take(l, 4),
                        preferred_element_type=jnp.float32)
            o = o + jnp.dot(ab[:, H:], take(l, 5),
                            preferred_element_type=jnp.float32)
            x = x + o

            hn = rms(x, ffn_norm_ref[pl.ds(l, 1), :]).astype(jnp.bfloat16)
            gates = [jnp.dot(hn, take(l, 6 + j),
                             preferred_element_type=jnp.float32)
                     for j in range(3)]
            ff = jnp.zeros((B, H), jnp.float32)
            for j in range(3):
                up = jnp.dot(hn, take(l, 9 + 2 * j),
                             preferred_element_type=jnp.float32)
                act = (jax.nn.silu(gates[j]) * up).astype(jnp.bfloat16)
                ff = ff + jnp.dot(act, take(l, 10 + 2 * j),
                                  preferred_element_type=jnp.float32)
            x = x + ff
            take(l, 15)                                      # dummy tile
            return x

        # prime both DMA pipelines, run the layers
        for j in range(N_BUF_W - 1):
            w_dma(jnp.int32(0), j).start()
        kv_start(jnp.int32(0), 0, 0)
        x = jax.lax.fori_loop(0, L, body, x_ref[:, :].astype(jnp.float32))
        y_ref[:, :] = x

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(B: int, L: int, S: int, H: int, NH: int, NKV: int, D: int,
                eps: float, read_ctx: int, quant: bool, masked: bool,
                interpret: bool):
    n_blocks = read_ctx // BLOCK_S
    kernel = _make_kernel(B=B, L=L, S=S, H=H, NH=NH, NKV=NKV, D=D,
                          eps=eps, n_blocks=n_blocks, quant=quant,
                          masked=masked)
    anys = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    NQ = NH * D
    TB = _tb_for(B)
    kv_dt = jnp.int8 if quant else jnp.bfloat16
    n_cache = 2 if quant else 1

    in_specs = ([vmem, vmem, vmem, vmem, vmem, smem]
                # x, rope c, rope s, val (n_valid | bitmask), live, widx
                + [anys] * 4                        # wqkv_t, wo, wgu_t, wdown
                + [vmem] * 4                        # norms
                + [anys] * n_cache)                 # cache values (+scales)
    # Outputs: the current K/V rows per layer (+ their scales when
    # quantized) and y. The cache itself is read-only here — the caller
    # merges the rows with one dynamic_update_slice (an in-kernel 1-row
    # DMA into the [.., S, D] cache is not tile-aligned on S and Mosaic
    # rejects the memref slice).
    out_shape = [jax.ShapeDtypeStruct((L, B, NKV, D), kv_dt),
                 jax.ShapeDtypeStruct((L, B, NKV, D), kv_dt)]
    out_specs = [vmem, vmem]
    if quant:
        out_shape += [jax.ShapeDtypeStruct((L, B, NKV), jnp.float32),
                      jax.ShapeDtypeStruct((L, B, NKV), jnp.float32)]
        out_specs += [vmem, vmem]
    out_shape.append(jax.ShapeDtypeStruct((B, H), jnp.float32))
    out_specs.append(vmem)

    scratch = [
        pltpu.VMEM((N_BUF_W, H, H), jnp.bfloat16),           # weight ring
        pltpu.SemaphoreType.DMA((N_BUF_W,)),
        pltpu.VMEM((N_BUF_KV, TB, NKV, BLOCK_S, D), kv_dt),  # K blocks
        pltpu.VMEM((N_BUF_KV, TB, NKV, BLOCK_S, D), kv_dt),  # V blocks
    ]
    if quant:
        scratch += [
            pltpu.VMEM((N_BUF_KV, TB, NKV, BLOCK_S), jnp.float32),
            pltpu.VMEM((N_BUF_KV, TB, NKV, BLOCK_S), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF_KV, 4)),
        ]
    else:
        scratch += [pltpu.SemaphoreType.DMA((N_BUF_KV, 2))]
    scratch += [pltpu.VMEM((B, NQ), jnp.bfloat16)]           # attn out

    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )


def talker_step_fused(layers_w, x: jax.Array, positions: jax.Array,
                      kv_cache, write_idx: jax.Array, n_valid: jax.Array,
                      *, n_heads: int, n_kv: int, head_dim: int,
                      eps: float, theta: float,
                      read_ctx: int | None = None,
                      valid_mask: jax.Array | None = None,
                      interpret: bool = False):
    """Drop-in for models/stack.stack_step on the shared-write-slot
    paths: lock-step (prefix validity via n_valid) and the serving ring
    (valid_mask [B, S] bool — slot validity bitmask; n_valid is then
    ignored, like stack_step). Ring lifetime windows are accepted
    upstream but not needed here: the bitmask is exact, so the kernel
    simply reads every block under read_ctx, like the XLA einsum.

    x: [B, H] f32; positions, n_valid: [B] i32; write_idx: scalar i32;
    kv_cache: stacked [L, 2, B, kv, S, D] bf16 or stack.QuantKV.
    Returns (y [B, H] f32 pre-output-norm, new_kv_cache).
    """
    from ..models.stack import QuantKV
    B, H = x.shape
    quant = isinstance(kv_cache, QuantKV)
    vals = kv_cache.values if quant else kv_cache
    L, S = vals.shape[0], vals.shape[4]
    rc = S if read_ctx is None else read_ctx

    # Pre-tile the N-sliced matrices into contiguous DMA blocks (XLA
    # hoists these transposes out of the chunk scan; K-sliced matrices
    # stream from their natural layout).
    wqkv_t = layers_w["wqkv"].reshape(L, H, 4, H).transpose(0, 2, 1, 3)
    wgu_t = layers_w["w_gu"].reshape(L, H, 6, H).transpose(0, 2, 1, 3)

    c, s = _rope_rows(positions, head_dim, theta)
    widx = write_idx.astype(jnp.int32)
    if valid_mask is not None:
        # clear the current slot's bit: its row is handled analytically
        # in VMEM (a dynamic-lane read inside the kernel would not
        # lower); `live` carries whether the slot was attendable
        live = jnp.take_along_axis(
            valid_mask, jnp.broadcast_to(widx, (B,))[:, None],
            axis=1).astype(jnp.int32)
        val = valid_mask.astype(jnp.int32)
        val = val.at[:, widx].set(0)
    else:
        val = n_valid.astype(jnp.int32).reshape(B, 1)
        live = (n_valid.astype(jnp.int32) > widx
                ).astype(jnp.int32).reshape(B, 1)

    call = _build_call(B, L, S, H, n_heads, n_kv, head_dim,
                       float(eps), int(rc), quant,
                       valid_mask is not None, bool(interpret))
    args = [x.astype(jnp.float32), c, s, val, live,
            widx.reshape(1, 1),
            wqkv_t, layers_w["wo"], wgu_t, layers_w["w_down"],
            layers_w["attn_norm"].astype(jnp.float32),
            layers_w["ffn_norm"].astype(jnp.float32),
            layers_w["q_norm"].astype(jnp.float32),
            layers_w["k_norm"].astype(jnp.float32)]
    # Merge the kernel's current rows into the cache with ONE DUS over
    # all layers (in-place under the caller's donated GenState, exactly
    # like the XLA stack_step's per-layer writes).
    if quant:
        krows, vrows, ksc, vsc, y = call(*args, kv_cache.values,
                                         kv_cache.scales)
        rows = jnp.stack([krows, vrows], axis=1)     # [L, 2, B, kv, D]
        scs = jnp.stack([ksc, vsc], axis=1)          # [L, 2, B, kv]
        new_v = jax.lax.dynamic_update_slice(
            kv_cache.values, rows[:, :, :, :, None, :],
            (0, 0, 0, 0, widx, 0))
        new_s = jax.lax.dynamic_update_slice(
            kv_cache.scales, scs[:, :, :, :, None],
            (0, 0, 0, 0, widx))
        return y, QuantKV(new_v, new_s)
    krows, vrows, y = call(*args, kv_cache)
    rows = jnp.stack([krows, vrows], axis=1)
    new_v = jax.lax.dynamic_update_slice(
        kv_cache, rows[:, :, :, :, None, :], (0, 0, 0, 0, widx, 0))
    return y, new_v
