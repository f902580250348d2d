"""Code predictor: 15 residual codebooks per frame as ONE fused lax.scan.

TPU-native replacement for all three reference backends of this stage
(GGML graphs tts_transformer.cpp:1514-1827 / :2185-2340, TensorRT+cuBLAS
trt_code_predictor.cpp:484-726, CoreML coreml_code_predictor.mm): the
2-token prefill plus 14 autoregressive steps run inside a single jitted
scan with the KV cache in the carry — the functional analogue of the TRT
path's single-sync design (one device round-trip per frame, there; zero,
here, because the scan lives inside the outer generation step).

Sequence semantics (predict_codes_autoregressive, tts_transformer.cpp:2153-2340):
  position 0: talker hidden state       (projected via mtp for 1.7B)
  position 1: talker codec_embd[cb0]    -> head[0] logits -> code_1
  position s+1 (s=1..14): code_pred.codec_embd[s-1][code_s] -> head[s]
All inputs are in talker space; RoPE uses the talker's theta
(build_code_pred_step_graph uses cfg.rope_theta, tts_transformer.cpp:1673).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..ops.layers import rms_norm
from ..ops.sampling import sample_codes
from .stack import stack_prefill, stack_step, write_prefill_to_cache

# Implementation selector for predict_codes (the fused Pallas megakernel
# vs the XLA scan — ops/codepred_fused.py). Resolved at TRACE time: like
# vocoder.set_res_chain_impl, changing it after a caller has jitted has
# no effect on cached executables (re-jit or restart to switch).
_IMPL = None                 # lazy: env QWEN3_TTS_CODEPRED, default auto
_IMPL_VALID = ("auto", "fused", "fused_interpret", "xla")


def set_codepred_impl(impl: str | None) -> None:
    """Override QWEN3_TTS_CODEPRED ('auto' | 'fused' | 'fused_interpret'
    | 'xla'). None resets to the environment value. Trace-time only —
    see the stale-executable caveat above."""
    global _IMPL
    if impl is not None and impl not in _IMPL_VALID:
        raise ValueError(f"impl must be one of {_IMPL_VALID}")
    _IMPL = impl


def _resolve_impl() -> str:
    if _IMPL is not None:
        return _IMPL
    import os
    impl = os.environ.get("QWEN3_TTS_CODEPRED", "auto")
    return impl if impl in _IMPL_VALID else "auto"


def _mtp(cp, x: jax.Array) -> jax.Array:
    """Talker-space -> code-pred-space projection (1.7B only;
    tts_transformer.cpp:1554-1560)."""
    if cp["mtp_w"] is None:
        return x
    y = jnp.dot(x.astype(cp["mtp_w"].dtype), cp["mtp_w"],
                preferred_element_type=jnp.float32)
    if cp["mtp_b"] is not None:
        y = y + cp["mtp_b"]
    return y


def predict_codes(w, cfg: TalkerConfig, hidden: jax.Array, cb0: jax.Array,
                  temperature: jax.Array, top_k: int,
                  key: jax.Array, greedy: bool = False,
                  top_p: float = 1.0) -> jax.Array:
    """Generate codebooks 1..15 for one frame, batched.

    hidden: [B, hidden] f32 (talker last hidden, post output-norm);
    cb0: [B] int32 (sampled first-codebook token).
    top_p (static): optional nucleus filter after top-k — a working
    extension over the reference, which defines top_p but never applies
    it (qwen3_tts.h:26). The fused megakernel samples in-kernel and has
    no nucleus path, so top_p < 1.0 routes to the XLA scan.
    Returns codes [B, 15] int32.
    """
    cp = w["code_pred"]
    n_steps = cfg.n_codebooks - 1          # 15
    ctx = n_steps + 1                      # 16 (init_code_pred_kv_cache(16))
    B = hidden.shape[0]

    # Fused megakernel dispatch (ops/codepred_fused.py): one Pallas
    # program for the whole frame — the mirror of the reference's
    # single-sync TRT loop (trt_code_predictor.cpp:484-600). Same
    # distribution; sampled draws use Gumbel-argmax instead of the XLA
    # path's categorical, so the streams differ for the same key.
    impl = _resolve_impl()
    if impl != "xla":
        from ..ops import codepred_fused
        ok = codepred_fused.supported(cfg, B, w) and top_p >= 1.0
        if impl in ("fused", "fused_interpret"):
            if not ok:
                raise ValueError(
                    "QWEN3_TTS_CODEPRED=fused but the fused kernel does "
                    "not support this config/batch/top_p (see "
                    "codepred_fused.supported; the kernel samples "
                    "in-kernel and has no nucleus path)")
            return codepred_fused.predict_codes_fused(
                w, cfg, hidden, cb0, temperature, top_k, key,
                greedy=greedy, interpret=(impl == "fused_interpret"))
        # auto: besides supported(), require a single device — Mosaic
        # kernels are not auto-partitionable, so tracing the pallas_call
        # on mesh-sharded operands inside a GSPMD program fails to
        # compile (or forces replication). Multi-chip meshes take the
        # XLA scan; explicit impl="fused" still forces the kernel.
        if ok and jax.default_backend() == "tpu" and jax.device_count() == 1:
            return codepred_fused.predict_codes_fused(
                w, cfg, hidden, cb0, temperature, top_k, key,
                greedy=greedy)

    x0 = hidden.astype(jnp.float32)
    # gather rows first, cast after (never convert the whole table)
    x1 = jnp.take(w["codec_embd"], cb0, axis=0).astype(jnp.float32)
    xs = _mtp(cp, jnp.stack([x0, x1], axis=1))          # [B, 2, Hc]

    # 2-token prefill at positions {0,1} (tts_transformer.cpp:2243-2288)
    positions = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None], (B, 2))
    y, ks, vs = stack_prefill(
        cp["layers"], xs, positions,
        n_heads=cfg.code_pred_n_attention_heads,
        n_kv=cfg.code_pred_n_kv_heads, head_dim=cfg.code_pred_head_dim,
        eps=cfg.rms_norm_eps, theta=cfg.rope_theta)

    kv_cache = jnp.zeros(
        (cfg.code_pred_layers, 2, B, cfg.code_pred_n_kv_heads, ctx,
         cfg.code_pred_head_dim), jnp.bfloat16)
    kv_cache = write_prefill_to_cache(kv_cache, ks, vs, 0)

    h = rms_norm(y[:, -1], cp["output_norm"], cfg.rms_norm_eps)
    head0 = cp["heads"][0]
    logits = jnp.dot(h.astype(head0.dtype), head0,
                     preferred_element_type=jnp.float32)
    key, sub = jax.random.split(key)
    code = sample_codes(logits, temperature, top_k, sub, greedy=greedy,
                        top_p=top_p)

    # 14 AR steps fused in one scan (vs. 14 graph rebuilds in the GGML
    # fallback, tts_transformer.cpp:2291-2337)
    def step(carry, s):
        kv_cache, prev_code, key = carry
        # embedding table (s-1+1)=s ... scan index s runs 0..13 for
        # generation steps 1..14: table index s, head index s+1.
        table = jax.lax.dynamic_index_in_dim(cp["embd"], s, axis=0,
                                             keepdims=False)
        x = jnp.take(table, prev_code, axis=0).astype(jnp.float32)
        x = _mtp(cp, x)
        n_past = s + 2
        pos = jnp.full((B,), n_past, jnp.int32)
        n_valid = jnp.full((B,), n_past + 1, jnp.int32)
        y, kv_cache = stack_step(
            cp["layers"], x, pos, kv_cache, n_past, n_valid,
            n_heads=cfg.code_pred_n_attention_heads,
            n_kv=cfg.code_pred_n_kv_heads, head_dim=cfg.code_pred_head_dim,
            eps=cfg.rms_norm_eps, theta=cfg.rope_theta)
        h = rms_norm(y, cp["output_norm"], cfg.rms_norm_eps)
        head = jax.lax.dynamic_index_in_dim(cp["heads"], s + 1, axis=0,
                                            keepdims=False)
        logits = jnp.dot(h.astype(head.dtype), head,
                         preferred_element_type=jnp.float32)
        key, sub = jax.random.split(key)
        code = sample_codes(logits, temperature, top_k, sub, greedy=greedy,
                        top_p=top_p)
        return (kv_cache, code, key), code

    (_, _, _), rest = jax.lax.scan(
        step, (kv_cache, code, key), jnp.arange(n_steps - 1, dtype=jnp.int32))
    # rest: [14, B]; prepend the prefill-sampled code
    codes = jnp.concatenate([code[None], rest], axis=0)      # [15, B]
    return codes.T.astype(jnp.int32)                          # [B, 15]


def frame_step_embedding(w, cfg: TalkerConfig, frame_codes: jax.Array,
                         trailing_row: jax.Array) -> jax.Array:
    """Next-step talker input embedding (tts_transformer.cpp:2529-2553):

      codec_embd[cb0] + sum_cb code_pred.codec_embd[cb-1][code_cb]
      + (trailing text row | tts_pad row)

    frame_codes: [B, 16] int32; trailing_row: [B, hidden] f32.
    """
    cp = w["code_pred"]
    cb0_embd = jnp.take(w["codec_embd"], frame_codes[:, 0],
                        axis=0).astype(jnp.float32)
    # Gather each codebook's embedding: tables [15, V, H], codes [B, 15]
    rest = jnp.einsum(
        "sbh->bh",
        jax.vmap(lambda table, codes: jnp.take(table, codes, axis=0))(
            cp["embd"], frame_codes[:, 1:].T).astype(jnp.float32))
    return cb0_embd + rest + trailing_row
