"""Vocoder: WavTokenizer-style decoder, codes[F,16] -> 24 kHz waveform.

TPU-native rebuild of both reference vocoder backends (GGML graphs in
audio_tokenizer_decoder.cpp and the fixed-frame TensorRT engine in
trt_vocoder.cpp) as one jitted XLA convolution pipeline, batched over
streams.

Pipeline (audio_tokenizer_decoder.cpp:622-802):
  RVQ dequant: first codebook + 15 rest codebooks, shared output
    projections, summed (:650-703)
  causal pre_conv k=3, 512 -> latent 1024 (:705-712)
  pre-transformer: in_proj 1024->512, 8 causal layers (RoPE theta 1e4,
    per-channel layer-scale on attn+FFN), RMSNorm, out_proj 512->1024
    (:412-488, :720-748)
  2x ConvNeXt upsample blocks: convT stride 2 + causal dwconv k=7 + LN +
    pointwise MLP (gelu) + gamma, residual (:490-549)
  dec0 conv k=7 -> 1536 (:758-763)
  4 decoder blocks: Snake + convT (rates 8,5,4,3; trim k-rate both sides)
    + 3 dilated-Snake residual blocks (dilations 1,3,9) (:551-620, :767-773)
  final Snake + conv k=7 -> 1 + tanh (:775-790)

Total upsampling 4 * 480 = 1920 samples per 12.5 Hz frame
(trt_vocoder.h:50).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VocoderConfig
from ..ops.layers import fast_sin2, rms_norm, rope_neox, NEG_INF

WDT = jnp.float32  # vocoder weight dtype (convs; small fraction of total cost)

# Residual-chain implementation switch (mirrors
# ops/attention.py::set_decode_attention_impl). "auto" = the fused Pallas
# kernel on TPU where the shapes allow it, XLA chain otherwise.
_RES_IMPL = "auto"
# which impls _res_chain traces actually used ("fused"/"xla") — recorded
# at TRACE time so benchmarks can report what truly ran instead of
# inferring from the backend (the ValueError fallback is silent)
_RES_IMPLS_TRACED: set = set()


def reset_res_chain_traced() -> None:
    _RES_IMPLS_TRACED.clear()


def res_chain_impl_traced() -> str:
    """"fused" / "xla" / "mixed" across every chain traced since the
    last reset; "untraced" if no trace happened (pure cache hits)."""
    if not _RES_IMPLS_TRACED:
        return "untraced"
    if _RES_IMPLS_TRACED == {"fused"}:
        return "fused"
    if _RES_IMPLS_TRACED == {"xla"}:
        return "xla"
    return "mixed"
_RES_VALID = ("auto", "fused", "fused_interpret", "xla")


def set_res_chain_impl(impl: str) -> None:
    """Select the decoder residual-chain implementation.

    TRACE-TIME switch: jitted callers bake the impl into their compiled
    executables — calling this after a vocoder graph has compiled has NO
    effect on the cached executables (including AOT-cache artifacts).
    Set it before the first decode, or restart the process to switch."""
    global _RES_IMPL
    if impl not in _RES_VALID:
        raise ValueError(f"impl must be one of {_RES_VALID}")
    _RES_IMPL = impl


# ---------------------------------------------------------------------------
# Conv primitives ([B, T, C] layout)
# ---------------------------------------------------------------------------

def causal_conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None,
                  dilation: int = 1, left_pad: int | None = None,
                  groups: int = 1) -> jax.Array:
    """Conv1d with explicit left (causal) zero padding.

    x: [B, T, C_in]; w: [C_out, C_in/groups, K] (torch order);
    left_pad defaults to dilation*(K-1) — fully causal.
    """
    k = w.shape[-1]
    if left_pad is None:
        left_pad = dilation * (k - 1)
    wk = jnp.transpose(w, (2, 1, 0))  # [K, C_in/groups, C_out]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), wk,
        window_strides=(1,), padding=[(left_pad, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def conv_transpose1d(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """ConvTranspose1d with torch/GGML semantics: out = (T-1)*stride + K.

    x: [B, T, C_in]; w: [C_in, C_out, K] (torch ConvTranspose1d order);
    exact scatter-add semantics of ggml_conv_transpose_1d
    (audio_tokenizer_decoder.cpp:498, :596).

    TPU formulation: ONE dense matmul [B*T, C_in] x [C_in, C_out*K]
    followed by ceil(K/stride) shifted adds — instead of an input-dilated
    convolution, which makes XLA multiply (stride-1)/stride zeros and is
    ~stride-times off the MXU roofline.
    """
    B, T, c_in = x.shape
    c_out, k = w.shape[1], w.shape[2]
    m = jnp.einsum("btc,cok->btok", x.astype(w.dtype), w,
                   preferred_element_type=jnp.float32)       # [B,T,Co,K]
    n_shift = -(-k // stride)
    k_pad = n_shift * stride
    if k_pad > k:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (0, k_pad - k)))
    m = m.reshape(B, T, c_out, n_shift, stride)
    n_blocks = T - 1 + n_shift
    # shift-add via zero-padded slices (adds fuse; no XLA scatter)
    out = None
    for s in range(n_shift):
        part = jnp.pad(m[:, :, :, s, :],
                       ((0, 0), (s, n_blocks - T - s), (0, 0), (0, 0)))
        out = part if out is None else out + part
    flat = out.transpose(0, 1, 3, 2).reshape(B, n_blocks * stride, c_out)
    return flat[:, :(T - 1) * stride + k]


# sin^2 implementation switch: "fast" (default) is numerically
# indistinguishable at audio scale (~1e-7, far below the bf16 weight
# quantization already in the path; the reference itself runs this whole
# stage in FP16 TensorRT — README.md:61-66). "exact" = jnp.sin, for A/B.
_SIN2_IMPL = "fast"


def set_snake_sin2_impl(impl: str) -> None:
    """Select snake's sin^2: 'fast' (fast_sin2 polynomial, err <= 3.5e-7,
    the process-wide default — both the serving and GGML-parity paths)
    or 'exact' (jnp.sin).

    TRACE-TIME switch like set_res_chain_impl: has no effect on already-
    compiled (or AOT-cached) executables; set before the first decode."""
    global _SIN2_IMPL
    if impl not in ("fast", "exact"):
        raise ValueError("impl must be 'fast' or 'exact'")
    _SIN2_IMPL = impl


def _sin2(z: jax.Array) -> jax.Array:
    if _SIN2_IMPL == "fast":
        return fast_sin2(z)
    s = jnp.sin(z)
    return s * s


def snake(x: jax.Array, alpha_log: jax.Array, beta_log: jax.Array) -> jax.Array:
    """Snake activation x + exp(-beta)*sin^2(exp(alpha)*x), per channel
    (apply_snake, audio_tokenizer_decoder.cpp:375-402). x: [B, T, C]."""
    a = jnp.exp(alpha_log.astype(jnp.float32))
    inv_b = jnp.exp(-beta_log.astype(jnp.float32))
    return x + inv_b * _sin2(x.astype(jnp.float32) * a)


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def _t(r, name):
    return jnp.asarray(r.tensor_data(name), WDT)


def _lin(r, name):
    """[out,in] -> [in,out] for x@w."""
    return jnp.asarray(np.ascontiguousarray(r.tensor_data(name).T), WDT)


def _maybe_normalize_codebook(r, cb_name: str, usage_name: str) -> jnp.ndarray:
    """codebook = embedding_sum / clamp(usage, 1e-5) when a usage tensor is
    present (normalize_codebooks, audio_tokenizer_decoder.cpp:40-73).
    The reference converter already pre-divides and drops usage tensors
    (convert_tokenizer_to_gguf.py:347-359), making the runtime pass a
    no-op; we support both layouts."""
    cb = r.tensor_data(cb_name).astype(np.float32)
    if usage_name in r.tensors:
        usage = r.tensor_data(usage_name).astype(np.float32)
        cb = cb / np.maximum(usage, 1e-5)[:, None]
    return jnp.asarray(cb, WDT)


def load_vocoder_weights(r, cfg: VocoderConfig) -> dict[str, Any]:
    n_rest = cfg.n_codebooks - 1
    # Output projections are stored as k=1 convs [out, in, 1]
    def proj(name):
        w = r.tensor_data(name)
        w = w.reshape(w.shape[0], w.shape[1])  # [out, in]
        return jnp.asarray(np.ascontiguousarray(w.T), WDT)  # [in, out]

    def tfm_layer(i):
        p = f"tok_dec.pre_tfm.blk.{i}"
        return {
            "attn_norm": _t(r, f"{p}.attn_norm.weight"),
            "wq": _lin(r, f"{p}.attn_q.weight"),
            "wk": _lin(r, f"{p}.attn_k.weight"),
            "wv": _lin(r, f"{p}.attn_v.weight"),
            "wo": _lin(r, f"{p}.attn_output.weight"),
            "attn_scale": _t(r, f"{p}.attn_scale"),
            "ffn_norm": _t(r, f"{p}.ffn_norm.weight"),
            "w_gate": _lin(r, f"{p}.ffn_gate.weight"),
            "w_up": _lin(r, f"{p}.ffn_up.weight"),
            "w_down": _lin(r, f"{p}.ffn_down.weight"),
            "ffn_scale": _t(r, f"{p}.ffn_scale"),
        }

    def upsample_block(i):
        p = f"tok_dec.upsample.{i}"
        return {
            # torch ConvTranspose1d weight [in, out, K]
            "conv_t_w": _t(r, f"{p}.conv.weight"),
            "conv_t_b": _t(r, f"{p}.conv.bias"),
            "dw_w": _t(r, f"{p}.dwconv.weight"),          # [C, 1, K]
            "dw_b": _t(r, f"{p}.dwconv.bias"),
            "ln_w": _t(r, f"{p}.norm.weight"),
            "ln_b": _t(r, f"{p}.norm.bias"),
            "pw1_w": _lin(r, f"{p}.pwconv1.weight"),
            "pw1_b": _t(r, f"{p}.pwconv1.bias"),
            "pw2_w": _lin(r, f"{p}.pwconv2.weight"),
            "pw2_b": _t(r, f"{p}.pwconv2.bias"),
            "gamma": _t(r, f"{p}.gamma"),
        }

    def res_block(blk, res):
        p = f"tok_dec.dec.{blk}.res.{res}"
        return {
            "a1": _t(r, f"{p}.act1.alpha"), "b1": _t(r, f"{p}.act1.beta"),
            "c1_w": _t(r, f"{p}.conv1.weight"), "c1_b": _t(r, f"{p}.conv1.bias"),
            "a2": _t(r, f"{p}.act2.alpha"), "b2": _t(r, f"{p}.act2.beta"),
            "c2_w": _t(r, f"{p}.conv2.weight"), "c2_b": _t(r, f"{p}.conv2.bias"),
        }

    def dec_block(blk):
        p = f"tok_dec.dec.{blk}"
        return {
            "snake_a": _t(r, f"{p}.snake.alpha"),
            "snake_b": _t(r, f"{p}.snake.beta"),
            "conv_t_w": _t(r, f"{p}.conv_t.weight"),
            "conv_t_b": _t(r, f"{p}.conv_t.bias"),
            # res indices in GGUF are 2..4 (block positions after snake+convT,
            # audio_tokenizer_decoder.cpp:272-311)
            "res": [res_block(blk, j) for j in (2, 3, 4)],
        }

    return {
        "vq_first_codebook": _maybe_normalize_codebook(
            r, "tok_dec.vq_first.0.codebook", "tok_dec.vq_first.0.usage"),
        "vq_first_out_proj": proj("tok_dec.vq_first.output_proj.weight"),
        "vq_rest_codebooks": jnp.stack([
            _maybe_normalize_codebook(
                r, f"tok_dec.vq_rest.{i}.codebook", f"tok_dec.vq_rest.{i}.usage")
            for i in range(n_rest)]),
        "vq_rest_out_proj": proj("tok_dec.vq_rest.output_proj.weight"),
        "pre_conv_w": _t(r, "tok_dec.pre_conv.weight"),
        "pre_conv_b": _t(r, "tok_dec.pre_conv.bias"),
        "pre_tfm": {
            "in_w": _lin(r, "tok_dec.pre_tfm.input_proj.weight"),
            "in_b": _t(r, "tok_dec.pre_tfm.input_proj.bias"),
            "out_w": _lin(r, "tok_dec.pre_tfm.output_proj.weight"),
            "out_b": _t(r, "tok_dec.pre_tfm.output_proj.bias"),
            "norm": _t(r, "tok_dec.pre_tfm.norm.weight"),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[tfm_layer(i)
                                     for i in range(cfg.n_pre_tfm_layers)]),
        },
        "upsample": [upsample_block(i) for i in range(2)],
        "dec0_w": _t(r, "tok_dec.dec.0.conv.weight"),
        "dec0_b": _t(r, "tok_dec.dec.0.conv.bias"),
        "dec_blocks": [dec_block(i) for i in (1, 2, 3, 4)],
        "dec5_a": _t(r, "tok_dec.dec.5.snake.alpha"),
        "dec5_b": _t(r, "tok_dec.dec.5.snake.beta"),
        "dec6_w": _t(r, "tok_dec.dec.6.conv.weight"),
        "dec6_b": _t(r, "tok_dec.dec.6.conv.bias"),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _pre_tfm_layer(wl, x: jax.Array, positions: jax.Array, n_heads: int,
                   eps: float, theta: float) -> jax.Array:
    """Causal pre-transformer layer with layer-scale
    (apply_pre_tfm_layer, audio_tokenizer_decoder.cpp:412-488)."""
    B, T, width = x.shape
    h = rms_norm(x, wl["attn_norm"], eps).astype(wl["wq"].dtype)
    q = jnp.dot(h, wl["wq"], preferred_element_type=jnp.float32)
    k = jnp.dot(h, wl["wk"], preferred_element_type=jnp.float32)
    v = jnp.dot(h, wl["wv"], preferred_element_type=jnp.float32)
    head_dim = q.shape[-1] // n_heads
    q = rope_neox(q.reshape(B, T, n_heads, head_dim), positions, theta)
    k = rope_neox(k.reshape(B, T, n_heads, head_dim), positions, theta)
    v = v.reshape(B, T, n_heads, head_dim)

    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / (head_dim ** 0.5)
    causal = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(causal[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    attn = jnp.dot(attn.reshape(B, T, n_heads * head_dim).astype(
        wl["wo"].dtype), wl["wo"], preferred_element_type=jnp.float32)
    x = x + attn * wl["attn_scale"]

    h = rms_norm(x, wl["ffn_norm"], eps).astype(wl["w_gate"].dtype)
    gate = jnp.dot(h, wl["w_gate"], preferred_element_type=jnp.float32)
    up = jnp.dot(h, wl["w_up"], preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(wl["w_down"].dtype)
    ffn = jnp.dot(act, wl["w_down"], preferred_element_type=jnp.float32)
    return x + ffn * wl["ffn_scale"]


def _upsample_block(w, x: jax.Array) -> jax.Array:
    """ConvNeXt-style 2x upsample (apply_upsample_block,
    audio_tokenizer_decoder.cpp:490-549): convT stride 2 (no trim) ->
    [causal dwconv k=7 + LN + pw MLP + gamma] residual."""
    c = x.shape[-1]
    x = conv_transpose1d(x, w["conv_t_w"], 2) + w["conv_t_b"]
    residual = x
    k = w["dw_w"].shape[-1]
    x = causal_conv1d(x, w["dw_w"], w["dw_b"], left_pad=k - 1, groups=c)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = ((x - mean) * jax.lax.rsqrt(var + 1e-6) * w["ln_w"].astype(jnp.float32)
         + w["ln_b"].astype(jnp.float32))
    x = jnp.dot(x.astype(w["pw1_w"].dtype), w["pw1_w"],
                preferred_element_type=jnp.float32) + w["pw1_b"]
    x = jax.nn.gelu(x, approximate=True)
    x = jnp.dot(x.astype(w["pw2_w"].dtype), w["pw2_w"],
                preferred_element_type=jnp.float32) + w["pw2_b"]
    return residual + x * w["gamma"].astype(jnp.float32)


def _residual_block(w, x: jax.Array, dilation: int) -> jax.Array:
    """Snake + dilated causal conv k=7 + Snake + conv k=1, residual
    (apply_residual_block, audio_tokenizer_decoder.cpp:551-579)."""
    residual = x
    x = snake(x, w["a1"], w["b1"])
    x = causal_conv1d(x, w["c1_w"], w["c1_b"], dilation=dilation)
    x = snake(x, w["a2"], w["b2"])
    x = causal_conv1d(x, w["c2_w"], w["c2_b"])
    return residual + x


def _decoder_block(w, x: jax.Array, rate: int,
                   trim: str = "both") -> jax.Array:
    """Snake + convT(stride=rate) + 3 residual blocks
    (apply_decoder_block, audio_tokenizer_decoder.cpp:581-620).

    trim="both": (K-rate) cut from BOTH sides — the GGML-path behavior
    (audio_tokenizer_decoder.cpp:601-609); output (T+1)*rate - K.
    trim="causal": (K-rate) cut from the left only — output EXACTLY
    T*rate, matching the reference's TRT engine whose fixed-frame chunks
    emit chunk_frames*1920 samples (trt_vocoder.cpp:151-166,
    trt_vocoder.h:50)."""
    impl = _RES_IMPL
    if trim == "causal" and (
            impl in ("fused", "fused_interpret")
            or (impl == "auto" and jax.default_backend() == "tpu")):
        # fused head: snake+convT+trim+bias in one HBM pass
        # (ops/vocoder_fused.py::fused_snake_convt)
        from ..ops.vocoder_fused import fused_snake_convt
        try:
            y = fused_snake_convt(
                x, w["snake_a"], w["snake_b"], w["conv_t_w"],
                w["conv_t_b"], rate, interpret=impl == "fused_interpret")
        except ValueError:  # unserved shape -> XLA chain below
            y = None
        if y is not None:
            # _res_chain stays OUTSIDE the try: a ValueError escaping it
            # after the head already ran must propagate, not re-apply
            # snake+convT to the upsampled tensor (silent corruption)
            return _res_chain(w["res"], y)
    x = snake(x, w["snake_a"], w["snake_b"])
    k = w["conv_t_w"].shape[-1]
    x = conv_transpose1d(x, w["conv_t_w"], rate)
    cut = k - rate
    if cut > 0:
        if trim == "both":
            x = x[:, cut:x.shape[1] - cut]
        else:
            x = x[:, cut:]
    x = x + w["conv_t_b"]
    return _res_chain(w["res"], x)


def _res_chain(res_list, x: jax.Array) -> jax.Array:
    """The 3-block dilated residual chain, dispatched to the fused Pallas
    kernel (ops/vocoder_fused.py) on TPU ("auto").

    Measured at the 40-frame-chunk serving shapes, B=48, fast_sin2 on
    both paths (tools/bench_vocoder_fused.py): 17.7 vs 20.4 ms (C=384),
    38.3 vs 83.1 (C=192), 39.8 vs 108.6 (C=96) — 1.2-2.7x over the XLA
    chain; the chain collapses from ~16 HBM passes to one."""
    impl = _RES_IMPL
    if impl in ("fused", "fused_interpret") or (
            impl == "auto" and jax.default_backend() == "tpu"):
        from ..ops.vocoder_fused import fused_residual_chain
        try:
            out = fused_residual_chain(
                x, res_list, interpret=impl == "fused_interpret")
            _RES_IMPLS_TRACED.add("fused")
            return out
        except ValueError:
            # shape not served (C>512 first decoder block, or no aligned
            # tile divides T) — fall back to the XLA chain
            pass
    _RES_IMPLS_TRACED.add("xla")
    for res_w, dilation in zip(res_list, (1, 3, 9)):
        x = _residual_block(res_w, x, dilation)
    return x


def vq_dequantize(w, cfg: VocoderConfig, codes: jax.Array) -> jax.Array:
    """RVQ lookup + shared projections, summed
    (audio_tokenizer_decoder.cpp:650-703). codes: [B, F, 16] -> [B, F, 512].

    The 15 'rest' codebooks share one output projection, so their
    embeddings are summed BEFORE projecting — one matmul instead of 15
    (linearity; same numerics as the reference's sum of projections).
    """
    first = jnp.take(w["vq_first_codebook"], codes[..., 0], axis=0)
    first = jnp.dot(first, w["vq_first_out_proj"],
                    preferred_element_type=jnp.float32)
    # rest: tables [15, V, D], codes [B, F, 15]
    rest_emb = jax.vmap(
        lambda table, c: jnp.take(table, c, axis=0),
        in_axes=(0, 2), out_axes=0)(w["vq_rest_codebooks"], codes[..., 1:])
    rest = jnp.dot(jnp.sum(rest_emb, axis=0).astype(w["vq_rest_out_proj"].dtype),
                   w["vq_rest_out_proj"], preferred_element_type=jnp.float32)
    return first + rest


def vocoder_output_length(w, cfg: VocoderConfig, n_frames: int,
                          trim: str = "both") -> int:
    """Exact output sample count for n_frames.

    trim="both" (GGML path): upsample convT has no trim
    (audio_tokenizer_decoder.cpp:498-501), decoder convT trims (K - rate)
    from BOTH sides (:601-609), plain convs are causal (length-preserving).
    trim="causal" (TRT-path sample arithmetic): each decoder block emits
    exactly T*rate, so (with the model's stride-2/K=2 upsample convTs)
    the total is exactly n_frames * samples_per_frame — the reference
    engine's chunk_frames*1920 (trt_vocoder.cpp:151-166)."""
    t = n_frames
    for up_w in w["upsample"]:
        t = (t - 1) * 2 + up_w["conv_t_w"].shape[-1]
    for blk_w, rate in zip(w["dec_blocks"], cfg.upsample_rates):
        if trim == "both":
            k = blk_w["conv_t_w"].shape[-1]
            t = (t - 1) * rate + k - 2 * (k - rate)
        else:
            t = t * rate
    return t


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg", "trim", "pcm16"))
def vocoder_decode(w, cfg: VocoderConfig, codes: jax.Array,
                   trim: str = "both", pcm16: bool = False) -> jax.Array:
    """Decode codes [B, F, n_codebooks] int32 -> audio f32 (or int16 PCM).

    trim="both": full-sequence GGML-path behavior
    (audio_tokenizer_decoder.cpp:804-879); output is
    vocoder_output_length(w, cfg, F) — slightly less than F*1920 because
    the decoder convT blocks trim (K-rate) from both sides.
    trim="causal": TRT-path sample arithmetic — exactly F *
    samples_per_frame samples (trt_vocoder.cpp:151-166); used by the
    streaming 40-frame chunked path in runtime.pipeline.
    pcm16=True: quantize to int16 PCM ON DEVICE (the 16-bit WAV payload
    the pipeline ultimately writes) — halves device->host bytes, which
    dominates serving on hosts with a thin transfer link.
    """
    return _decode_impl(w, cfg, codes, trim, pcm16)


@_partial(jax.jit, static_argnames=("cfg", "trim", "pcm16", "sub"))
def vocoder_decode_subbatched(w, cfg: VocoderConfig, codes: jax.Array,
                              trim: str = "causal", pcm16: bool = False,
                              sub: int = 16) -> jax.Array:
    """Whole-batch decode in ONE device dispatch with bounded memory.

    lax.map runs `sub`-wide sub-batches sequentially INSIDE one compiled
    executable: activation memory is bounded by a single sub-batch (the
    76k-sample tail buffers OOM past ~48-wide on a 16 GB chip next to a
    large talker KV cache) while the host pays one dispatch instead of
    B/sub. Each dispatch through the axon tunnel costs 1-200 ms depending
    on congestion — at B=160/sub=16 the python-loop version was measured
    3.5x slower than its own compute under tunnel load.

    B must be a multiple of `sub` (callers bucket decode batches already).
    """
    B, F, C = codes.shape
    if B <= sub:
        return _decode_impl(w, cfg, codes, trim, pcm16)
    assert B % sub == 0, f"batch {B} not a multiple of sub {sub}"
    # FRONT (vq + pre-transformer + ConvNeXt upsample + dec0) runs once
    # over the WHOLE batch: its activations are small ([B, 4F, 1536] f32
    # peaks ~190 MB at B=192/F=40 — nothing next to the 1.4 GB tail
    # buffers), and at sub-batch width its ops are far too skinny for the
    # MXU — the per-op XLA passes repeated B/sub sequential times were
    # the last un-fused 6.8 ms/chunk of the decode. Only the tail
    # (decoder convT blocks, 160 -> 76,800 samples) needs lax.map's
    # activation bound.
    x = _front_impl(w, cfg, codes)
    groups = x.reshape(B // sub, sub, *x.shape[1:])
    out = jax.lax.map(
        lambda g: _tail_impl(w, cfg, g, trim, pcm16), groups)
    return out.reshape(B, out.shape[-1])


def _decode_impl(w, cfg: VocoderConfig, codes: jax.Array,
                 trim: str, pcm16: bool) -> jax.Array:
    return _tail_impl(w, cfg, _front_impl(w, cfg, codes), trim, pcm16)


def _front_impl(w, cfg: VocoderConfig, codes: jax.Array) -> jax.Array:
    """vq dequant + pre-transformer + ConvNeXt upsample + dec0:
    codes [B, F, 16] -> latent [B, 4F(+pad), decoder_dim]. Activations
    stay small (T <= 4F+2); batch-wide execution is the fast path."""
    B, F, _ = codes.shape
    x = vq_dequantize(w, cfg, codes)                        # [B, F, 512]
    x = causal_conv1d(x, w["pre_conv_w"], w["pre_conv_b"])  # [B, F, 1024]

    t = w["pre_tfm"]
    x = jnp.dot(x.astype(t["in_w"].dtype), t["in_w"],
                preferred_element_type=jnp.float32) + t["in_b"]  # [B, F, 512]
    positions = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None], (B, F))

    def layer(carry, wl):
        return _pre_tfm_layer(wl, carry, positions, cfg.n_heads,
                              cfg.rms_norm_eps, cfg.rope_theta), None
    x, _ = jax.lax.scan(layer, x.astype(jnp.float32), t["layers"])
    x = rms_norm(x, t["norm"], cfg.rms_norm_eps)
    x = jnp.dot(x.astype(t["out_w"].dtype), t["out_w"],
                preferred_element_type=jnp.float32) + t["out_b"]  # [B,F,1024]

    for up_w in w["upsample"]:
        x = _upsample_block(up_w, x)                        # [B, 4F(+pad), 1024]

    return causal_conv1d(x, w["dec0_w"], w["dec0_b"])       # -> decoder_dim


def _tail_impl(w, cfg: VocoderConfig, x: jax.Array,
               trim: str, pcm16: bool) -> jax.Array:
    """Decoder convT blocks + final snake/conv/tanh: latent
    [B, T, decoder_dim] -> audio [B, T*480] — the memory-heavy stage
    (76,800-sample tail buffers); sub-batched by the callers."""
    for blk_w, rate in zip(w["dec_blocks"], cfg.upsample_rates):
        x = _decoder_block(blk_w, x, rate, trim)

    x = snake(x, w["dec5_a"], w["dec5_b"])
    x = causal_conv1d(x, w["dec6_w"], w["dec6_b"])          # [B, T, 1]
    audio = jnp.tanh(x[..., 0])
    if pcm16:
        return jnp.clip(jnp.round(audio * 32767.0),
                        -32768, 32767).astype(jnp.int16)
    return audio


def cast_weights(w, dtype=jnp.bfloat16):
    """Cast conv/matmul kernels (ndim >= 2) to a compute dtype, keeping
    1-D params (norms, biases, Snake alphas) in f32.

    bf16 is the TPU fast path — sanctioned by the reference, whose TRT
    vocoder engines run FP16 (README.md:61-66); only the code predictor
    needs BF16-or-better (README.md:72), which we already satisfy.
    """
    def cast(a):
        if hasattr(a, "ndim") and a.ndim >= 2 and a.dtype == jnp.float32:
            return a.astype(dtype)
        return a
    return jax.tree.map(cast, w)


# ---------------------------------------------------------------------------
# Random init (tests)
# ---------------------------------------------------------------------------

def tiny_vocoder_config() -> VocoderConfig:
    return VocoderConfig(
        sample_rate=24000, n_codebooks=16, codebook_size=64,
        codebook_dim=8, latent_dim=32, hidden_dim=16,
        n_pre_tfm_layers=2, n_heads=4, decoder_dim=32,
        upsample_rates=(2, 2, 2, 2))


def init_vocoder_weights(rng: np.random.Generator,
                         cfg: VocoderConfig) -> dict[str, Any]:
    def rn(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, WDT)
    return _build_vocoder_weights(rn, cfg)


def init_vocoder_weights_device(cfg: VocoderConfig, aot_cache=None,
                                compute_dtype=jnp.bfloat16) -> dict[str, Any]:
    """Benchmark weight init built entirely ON-DEVICE in one jitted
    program (fast_fill hash generator + cast_weights fused in). The
    host-numpy path (init_vocoder_weights) dispatches one eager device
    transfer per leaf through the axon tunnel (~28 s) and then pays a
    second full upload at device_put+cast (~13-24 s) — measured in
    tools/probe_init.py; this path is one tiny executable (~seconds,
    AOT-cacheable)."""
    import jax
    from .weights import fast_fill

    import itertools
    seed_ctr = itertools.count(1)

    def build():
        def rn(*shape, scale=0.1):
            return fast_fill(shape, next(seed_ctr), scale, WDT)
        return cast_weights(_build_vocoder_weights(rn, cfg), compute_dtype)

    jfn = jax.jit(build)
    if aot_cache is not None:
        name = (f"vwinit-fast-{cfg.hidden_dim}x{cfg.latent_dim}"
                f"x{cfg.decoder_dim}-t{cfg.n_pre_tfm_layers}"
                f"-{jnp.dtype(compute_dtype).name}")
        return aot_cache.get_or_compile(name, jfn)()
    return jfn()


def _build_vocoder_weights(rn, cfg: VocoderConfig) -> dict[str, Any]:

    width = cfg.hidden_dim  # transformer width (512 in the real model)
    qkv = cfg.latent_dim

    def tfm_layer():
        return {
            "attn_norm": jnp.ones((width,), WDT),
            "wq": rn(width, qkv), "wk": rn(width, qkv), "wv": rn(width, qkv),
            "wo": rn(qkv, width),
            "attn_scale": jnp.full((width,), 0.5, WDT),
            "ffn_norm": jnp.ones((width,), WDT),
            "w_gate": rn(width, 2 * width), "w_up": rn(width, 2 * width),
            "w_down": rn(2 * width, width),
            "ffn_scale": jnp.full((width,), 0.5, WDT),
        }

    def upsample_block(c):
        return {
            "conv_t_w": rn(c, c, 2), "conv_t_b": jnp.zeros((c,), WDT),
            "dw_w": rn(c, 1, 7), "dw_b": jnp.zeros((c,), WDT),
            "ln_w": jnp.ones((c,), WDT), "ln_b": jnp.zeros((c,), WDT),
            "pw1_w": rn(c, 2 * c), "pw1_b": jnp.zeros((2 * c,), WDT),
            "pw2_w": rn(2 * c, c), "pw2_b": jnp.zeros((c,), WDT),
            "gamma": jnp.full((c,), 0.5, WDT),
        }

    def res_block(c):
        return {
            "a1": jnp.zeros((c,), WDT), "b1": jnp.zeros((c,), WDT),
            "c1_w": rn(c, c, 7), "c1_b": jnp.zeros((c,), WDT),
            "a2": jnp.zeros((c,), WDT), "b2": jnp.zeros((c,), WDT),
            "c2_w": rn(c, c, 1), "c2_b": jnp.zeros((c,), WDT),
        }

    def dec_block(c_in, rate):
        c_out = c_in // 2
        return {
            "snake_a": jnp.zeros((c_in,), WDT),
            "snake_b": jnp.zeros((c_in,), WDT),
            "conv_t_w": rn(c_in, c_out, 2 * rate),
            "conv_t_b": jnp.zeros((c_out,), WDT),
            "res": [res_block(c_out) for _ in range(3)],
        }

    c = cfg.decoder_dim
    dec_blocks = []
    for rate in cfg.upsample_rates:
        dec_blocks.append(dec_block(c, rate))
        c //= 2

    return {
        "vq_first_codebook": rn(cfg.codebook_size, cfg.codebook_dim, scale=1.0),
        "vq_first_out_proj": rn(cfg.codebook_dim, cfg.hidden_dim),
        "vq_rest_codebooks": rn(cfg.n_codebooks - 1, cfg.codebook_size,
                                cfg.codebook_dim, scale=1.0),
        "vq_rest_out_proj": rn(cfg.codebook_dim, cfg.hidden_dim),
        "pre_conv_w": rn(cfg.latent_dim, cfg.hidden_dim, 3),
        "pre_conv_b": jnp.zeros((cfg.latent_dim,), WDT),
        "pre_tfm": {
            "in_w": rn(cfg.latent_dim, width),
            "in_b": jnp.zeros((width,), WDT),
            "out_w": rn(width, cfg.latent_dim),
            "out_b": jnp.zeros((cfg.latent_dim,), WDT),
            "norm": jnp.ones((width,), WDT),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[tfm_layer()
                                     for _ in range(cfg.n_pre_tfm_layers)]),
        },
        "upsample": [upsample_block(cfg.latent_dim) for _ in range(2)],
        "dec0_w": rn(cfg.decoder_dim, cfg.latent_dim, 7),
        "dec0_b": jnp.zeros((cfg.decoder_dim,), WDT),
        "dec_blocks": dec_blocks,
        "dec5_a": jnp.zeros((c,), WDT),
        "dec5_b": jnp.zeros((c,), WDT),
        "dec6_w": rn(1, c, 7),
        "dec6_b": jnp.zeros((1,), WDT),
    }
