"""Fused Pallas kernel for the vocoder's residual Snake blocks.

The vocoder decoder blocks (models/vocoder.py::_decoder_block, mirroring
apply_decoder_block at audio_tokenizer_decoder.cpp:551-620) end in a chain
of 3 residual blocks:

    for d in (1, 3, 9):
        x = x + conv1(snake(conv7_d(snake(x))))

At the tail stages T reaches 76,800 samples per 40-frame chunk while C
shrinks to 96-384 channels, so the chain is pure HBM bandwidth: the XLA
lowering runs each of the 6 convs and 4 snakes as separate HBM passes
(~16 activation passes per decoder block), measured 88-107 ms per chunk
for the last two blocks at B=48 (tools/bench_vocoder_stages.py).

This kernel computes the WHOLE chain in one pass: grid (B, T/TILE) with
the tile index minor, so programs sweep each stream's timeline in order
and carry the causal halo of every stage (6*d rows) in VMEM scratch
between programs. Each activation row is read from HBM exactly once and
written once — speed-of-light IO for the chain.

Per tile, each dilated conv7 is 7 accumulating [TILE, C] x [C, C] MXU
dots, one per tap, each reading a row-shifted window of the snake'd
extended tile. (A single [TILE, 7C] @ [7C, C] contraction would be
MXU-deeper, but Mosaic cannot lane-concatenate vregs whose sublane
offsets differ — "result/input offset mismatch on non-concat dimension"
— and the chain is HBM-bound, not MXU-bound, so tap-wise dots cost
nothing extra.)

Matmul inputs are bf16 with f32 accumulation — the same discipline the
XLA path already uses (vocoder weights are cast to bf16 in production,
models/vocoder.py::cast_weights); snake and the residual adds stay f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9)
_HALOS = tuple(6 * d for d in DILATIONS)        # (6, 18, 54)


def pack_res_weights(res_list):
    """Precompute kernel-ready parameters from _residual_block weight dicts.

    Returns a flat tuple of arrays:
      per block: a1, ib1, w7 [7C, C] bf16, b1 [1, C], a2, ib2,
                 w1 [C, C] bf16, b2 [1, C]
    where a = exp(alpha_log) and ib = exp(-beta_log) are the Snake
    constants (models/vocoder.py::snake), shaped [1, C] f32.
    """
    packed = []
    for rw in res_list:
        c = rw["c1_w"].shape[0]
        w7 = jnp.transpose(rw["c1_w"].astype(jnp.float32),
                           (2, 1, 0)).reshape(7 * c, c)       # [k,Cin,Cout]
        w1 = rw["c2_w"][:, :, 0].T.astype(jnp.float32)         # [Cin, Cout]
        packed += [
            jnp.exp(rw["a1"].astype(jnp.float32))[None, :],
            jnp.exp(-rw["b1"].astype(jnp.float32))[None, :],
            w7.astype(jnp.bfloat16),
            rw["c1_b"].astype(jnp.float32)[None, :],
            jnp.exp(rw["a2"].astype(jnp.float32))[None, :],
            jnp.exp(-rw["b2"].astype(jnp.float32))[None, :],
            w1.astype(jnp.bfloat16),
            rw["c2_b"].astype(jnp.float32)[None, :],
        ]
    return tuple(packed)


def _snake(x, a, ib):
    from ..models import vocoder as _voc
    from .layers import fast_sin2
    if _voc._SIN2_IMPL == "fast":
        return x + ib * fast_sin2(x * a)
    s = jnp.sin(x * a)
    return x + ib * (s * s)


def _kernel(x_ref, *refs, tile: int, channels: int):
    # refs: 3 blocks x 8 params, out_ref, then 3 halo scratch buffers
    params, rest = refs[:24], refs[24:]
    out_ref = rest[0]
    halos = rest[1:4]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for h in halos:
            h[:] = jnp.zeros_like(h)

    x = x_ref[0].astype(jnp.float32)                     # [TILE, C]
    for blk in range(3):
        (a1, ib1, w7, b1, a2, ib2, w1, b2) = params[blk * 8:(blk + 1) * 8]
        d = DILATIONS[blk]
        halo = halos[blk]                                # [6d, C]
        ext = jnp.concatenate([halo[:], x], axis=0)      # [6d+TILE, C]
        halo[:] = ext[-6 * d:]
        # Keep the tap slicing in f32: slicing packed bf16 vregs at
        # sublane offsets k*d forces expensive Mosaic relayouts (measured
        # 2x whole-kernel slowdown at C=384); the f32 (8,128) layout
        # keeps the offset lazy and the per-tap cast is one pack op.
        s = _snake(ext, a1[:], ib1[:])
        w7v = w7[:]
        y = b1[:] + sum(
            jnp.dot(s[k * d:k * d + tile].astype(jnp.bfloat16),
                    w7v[k * channels:(k + 1) * channels],
                    preferred_element_type=jnp.float32)
            for k in range(7))
        y = _snake(y, a2[:], ib2[:])
        y = jnp.dot(y.astype(jnp.bfloat16), w1[:],
                    preferred_element_type=jnp.float32) + b2[:]
        x = x + y
    out_ref[0] = x.astype(out_ref.dtype)


def _convt_kernel(x_ref, whi_ref, wlo_ref, b_ref, a_ref, ib_ref, out_ref,
                  halo, *, tile: int):
    """Snake + stride-r causal-trim convT for one tile, grid REVERSED.

    With K = 2r taps, output row r*q+p = s[q] @ W[p+r] + s[q+1] @ W[p]
    (s = snake(x)): one future input row. The grid walks tiles LAST to
    FIRST, so the next data tile's first snake'd row was computed by the
    previous program and sits in `halo`; the final data tile (processed
    first) uses the zero halo — exactly conv_transpose's implicit zero
    padding at the sequence end."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        halo[:] = jnp.zeros_like(halo)

    x = x_ref[0].astype(jnp.float32)
    s = _snake(x, a_ref[:], ib_ref[:])                 # [tile, C]
    s_next = jnp.concatenate([s[1:], halo[:]], axis=0)
    halo[:] = s[:1]
    y = (jnp.dot(s.astype(jnp.bfloat16), whi_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(s_next.astype(jnp.bfloat16), wlo_ref[:],
                   preferred_element_type=jnp.float32)
         + b_ref[:])
    out_ref[0] = y.astype(out_ref.dtype)


def fused_snake_convt(x: jax.Array, snake_alpha_log: jax.Array,
                      snake_beta_log: jax.Array, conv_t_w: jax.Array,
                      conv_t_b: jax.Array, rate: int, *,
                      interpret: bool = False) -> jax.Array:
    """Decoder-block head: snake + convT(stride=rate, K=2*rate) with
    causal trim (K-rate off the left) + bias, fused into one HBM pass.

    x: [B, T, C]; conv_t_w: [C, C2, K] (torch ConvTranspose1d order);
    returns [B, T*rate, C2] f32 — identical to
    snake -> conv_transpose1d -> [:, K-rate:][: T*rate] + bias
    (models/vocoder.py::_decoder_block head, mirroring
    apply_decoder_block at audio_tokenizer_decoder.cpp:581-609 in its
    TRT causal-trim variant, trt_vocoder.cpp:151-166).

    Phase-major packing makes the whole convT two MXU dots per tile:
    Whi[:, p*C2+c2] = W[:, c2, p+rate], Wlo[:, p*C2+c2] = W[:, c2, p];
    the [tile, rate*C2] result reshapes to [tile*rate, C2] for free
    (row-major contiguity). Raises ValueError for unserved shapes."""
    B, T, C = x.shape
    C2, K = conv_t_w.shape[1], conv_t_w.shape[2]
    if K != 2 * rate:
        raise ValueError("kernel serves K == 2*rate convT only")
    if C > 1536 or C2 * rate > 8192:
        raise ValueError("channel count too large for VMEM weights")
    tile = _pick_tile(T, C)
    if tile < 8:
        raise ValueError(f"no usable tile for T={T}")

    wf = conv_t_w.astype(jnp.float32)
    whi = jnp.transpose(wf[:, :, rate:], (0, 2, 1)).reshape(
        C, rate * C2).astype(jnp.bfloat16)
    wlo = jnp.transpose(wf[:, :, :rate], (0, 2, 1)).reshape(
        C, rate * C2).astype(jnp.bfloat16)
    bias = jnp.tile(conv_t_b.astype(jnp.float32), rate)[None, :]
    a = jnp.exp(snake_alpha_log.astype(jnp.float32))[None, :]
    ib = jnp.exp(-snake_beta_log.astype(jnp.float32))[None, :]

    nt = T // tile
    rev = lambda b, t: (b, nt - 1 - t, 0)
    out = pl.pallas_call(
        partial(_convt_kernel, tile=tile),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, C), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, rate * C2), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, rate * C2), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rate * C2), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, rate * C2), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, rate * C2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, whi, wlo, bias, a, ib)
    return out.reshape(B, T * rate, C2)


def _pick_tile(t: int, c: int) -> int:
    """Largest tile <= budget that divides T and is sublane-aligned.

    ~8 MB f32 tiles: the kernel holds ~6 tile-sized f32 intermediates in
    VMEM (in, ext, snake, per-tap cast, accumulator, out) so this stays
    within the raised 100 MB limit while amortizing per-program
    overheads. Measured flat 768..19200 at C=96 (the stage is VPU-bound,
    NOTES.md), so the exact budget is not sensitive."""
    budget = max(256, min(20000, (8 << 20) // (c * 4)))
    best = 0
    for cand in range(8, budget + 1, 8):
        if t % cand == 0:
            best = cand
    return best


def fused_residual_chain(x: jax.Array, res_list, *,
                         interpret: bool = False) -> jax.Array:
    """Apply the 3-block residual Snake chain with dilations (1, 3, 9).

    x: [B, T, C] f32 (or bf16); res_list: the _decoder_block "res" weight
    dicts. Raises ValueError for shapes the kernel does not serve (caller
    falls back to the XLA chain).
    """
    B, T, C = x.shape
    if len(res_list) != 3:
        raise ValueError("kernel serves exactly 3 residual blocks")
    if any(rw["c1_w"].shape[-1] != 7 for rw in res_list):
        raise ValueError("conv kernel width must be 7")
    if C > 768:
        # 3 blocks x ([7C,C]+[C,C]) bf16 weights + ~6 tile-sized f32
        # intermediates must fit the 100 MB VMEM limit; C=768 (decoder
        # block 1) measures ~55 MB peak and is the largest served.
        raise ValueError("channel count too large for VMEM weights")
    tile = _pick_tile(T, C)
    if tile < 64:
        raise ValueError(f"no usable tile for T={T}")

    params = pack_res_weights(res_list)
    vec_spec = pl.BlockSpec((1, C), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_specs = {
        "w7": pl.BlockSpec((7 * C, C), lambda b, t: (0, 0),
                           memory_space=pltpu.VMEM),
        "w1": pl.BlockSpec((C, C), lambda b, t: (0, 0),
                           memory_space=pltpu.VMEM),
    }
    param_specs = []
    for blk in range(3):
        param_specs += [vec_spec, vec_spec, mat_specs["w7"], vec_spec,
                        vec_spec, vec_spec, mat_specs["w1"], vec_spec]

    grid = (B, T // tile)
    out = pl.pallas_call(
        partial(_kernel, tile=tile, channels=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, C), jnp.float32) for h in _HALOS
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *params)
    return out
