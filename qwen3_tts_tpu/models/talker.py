"""Talker decoder: prefill-embedding construction, prefill, decode step.

TPU-native rebuild of the reference's TTSTransformer talker path:
  - text projection (project_text_tokens, tts_transformer.cpp:1026-1091)
  - prefill-embedding recipe (build_prefill_graph, tts_transformer.cpp:1093-1231)
  - batched prefill forward (build_prefill_forward_graph, :1233-1374)
  - single-token decode step (build_step_graph, :1376-1512)

Everything carries a batch dimension over concurrent streams — the
reference is strictly single-stream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..ops.layers import rms_norm
from .stack import stack_prefill, stack_step, write_prefill_to_cache


def project_text_tokens(w, tokens: jax.Array) -> jax.Array:
    """text_embd lookup -> fc1 -> SiLU -> fc2 (tts_transformer.cpp:1050-1055).

    tokens: [...] int32 -> returns [..., hidden] f32.
    """
    tp = w["text_proj"]
    x = jnp.take(w["text_embd"], tokens, axis=0)
    x = jnp.dot(x, tp["fc1_w"], preferred_element_type=jnp.float32)
    x = x + tp["fc1_b"]
    x = jax.nn.silu(x).astype(tp["fc2_w"].dtype)
    x = jnp.dot(x, tp["fc2_w"], preferred_element_type=jnp.float32)
    return x + tp["fc2_b"]


class PrefillInputs(NamedTuple):
    """Dense prefill + per-frame trailing-text schedule for a batch."""
    prefill_embd: jax.Array      # [B, P, hidden] f32
    trailing_hidden: jax.Array   # [B, T_trail, hidden] f32
    trailing_len: jax.Array      # [B] int32 (= n_tokens - 8)
    tts_pad_embed: jax.Array     # [B, hidden] f32
    n_text_tokens: jax.Array     # [B] int32 (full templated token count)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg", "use_think"))
def build_prefill_inputs(w, cfg: TalkerConfig, tokens: jax.Array,
                         token_len: jax.Array, speaker_embd: jax.Array,
                         language_id: jax.Array | None = None,
                         use_think: bool = True) -> PrefillInputs:
    """Construct the prefill-embedding matrix and trailing-text schedule.

    Exact port of build_prefill_graph (tts_transformer.cpp:1093-1231),
    vectorized over a batch:

      prefill = [ proj(tok[0:3]),
                  codec_rows + tts_pad overlay (last row + tts_bos),
                  proj(tok[3]) + codec_bos_row ]
      codec rows = think prefix (+ language id) ++ speaker ++ [pad, bos]
      trailing  = proj(tok[4 : n-5]) ++ [tts_eos]

    tokens: [B, T_max] int32 (templated ids, padded); token_len: [B];
    speaker_embd: [B, hidden] f32 (zeros = default voice,
    qwen3_tts.cpp:241-245). `use_think` selects the think/nothink codec
    prefix (static; language_id is a per-stream array when use_think).
    """
    B, t_max = tokens.shape
    proj_all = project_text_tokens(w, tokens)            # [B, T_max, H]

    specials = jnp.array([cfg.tts_bos_token_id, cfg.tts_eos_token_id,
                          cfg.tts_pad_token_id], dtype=jnp.int32)
    sp = project_text_tokens(w, specials)                # [3, H]
    tts_bos, tts_eos, tts_pad = sp[0], sp[1], sp[2]

    codec_embd = w["codec_embd"]
    if use_think:
        if language_id is None:
            language_id = jnp.full((B,), cfg.english_language_id, jnp.int32)
        prefix_ids = jnp.stack([
            jnp.full((B,), cfg.codec_think_id, jnp.int32),
            jnp.full((B,), cfg.codec_think_bos_id, jnp.int32),
            language_id.astype(jnp.int32),
            jnp.full((B,), cfg.codec_think_eos_id, jnp.int32),
        ], axis=1)                                        # [B, 4]
    else:
        prefix_ids = jnp.broadcast_to(
            jnp.array([cfg.codec_nothink_id, cfg.codec_think_bos_id,
                       cfg.codec_think_eos_id], jnp.int32), (B, 3))

    prefix_rows = jnp.take(codec_embd, prefix_ids,
                           axis=0).astype(jnp.float32)            # [B, P0, H]
    tail_rows = jnp.take(codec_embd,
                         jnp.array([cfg.codec_pad_id, cfg.codec_bos_id],
                                   jnp.int32), axis=0).astype(jnp.float32)
    tail_rows = jnp.broadcast_to(tail_rows[None], (B, 2, tail_rows.shape[-1]))

    codec_input = jnp.concatenate(
        [prefix_rows, speaker_embd[:, None, :].astype(jnp.float32), tail_rows],
        axis=1)                                                   # [B, P0+3, H]
    n_codec = codec_input.shape[1]

    # Overlay: rows 0..n_codec-2 get +tts_pad, except the last of those
    # (the codec_pad row) which gets +tts_bos (tts_transformer.cpp:1182-1193).
    overlay_len = n_codec - 1
    overlay = jnp.where(
        (jnp.arange(overlay_len) == overlay_len - 1)[None, :, None],
        tts_bos[None, None, :], tts_pad[None, None, :])
    codec_overlaid = codec_input[:, :overlay_len] + overlay

    # Last prefill row: proj(tok[3]) + codec_bos row (:1195-1204)
    last_row = proj_all[:, 3] + codec_input[:, n_codec - 1]

    prefill = jnp.concatenate(
        [proj_all[:, :3], codec_overlaid, last_row[:, None]], axis=1)

    # Trailing-text schedule (:1214-1228): proj(tok[4 .. n-6]) ++ tts_eos.
    # Row i of the trailing buffer: proj(tok[4+i]) for i < len-9,
    # tts_eos at i == len-9, unused beyond (masked by trailing_len).
    t_trail = max(t_max - 9 + 1, 1)
    trail_proj = proj_all[:, 4:4 + t_trail]
    if trail_proj.shape[1] < t_trail:
        trail_proj = jnp.pad(trail_proj,
                             ((0, 0), (0, t_trail - trail_proj.shape[1]), (0, 0)))
    # max(0, n-9): with the 8-token empty-text template the eos row is
    # row 0, not -1/absent (trailing_token_count = max(0, n_tokens-9),
    # tts_transformer.cpp:1214-1228)
    eos_pos = jnp.maximum(token_len - 9, 0)[:, None]              # [B,1]
    idx = jnp.arange(t_trail)[None, :]
    trailing = jnp.where((idx == eos_pos)[..., None],
                         tts_eos[None, None, :], trail_proj)
    trailing_len = jnp.maximum(token_len - 8, 1).astype(jnp.int32)

    tts_pad_b = jnp.broadcast_to(tts_pad[None], (B, tts_pad.shape[0]))
    return PrefillInputs(prefill, trailing, trailing_len, tts_pad_b,
                         token_len.astype(jnp.int32))


def forward_text(w, cfg: TalkerConfig, tokens: jax.Array,
                 speaker_embd: jax.Array | None, kv_cache: jax.Array):
    """Project text tokens (+ optional speaker embedding added to every
    row) and run a prefill — API parity with TTSTransformer::forward_text
    (tts_transformer.cpp:1922-1950). tokens: [B, T] int32."""
    x = project_text_tokens(w, tokens)
    if speaker_embd is not None:
        x = x + speaker_embd[:, None, :].astype(jnp.float32)
    return talker_prefill(w, cfg, x, kv_cache)


def talker_prefill(w, cfg: TalkerConfig, prefill_embd: jax.Array,
                   kv_cache: jax.Array):
    """Batched prefill from an empty cache.

    prefill_embd: [B, P, hidden]; kv_cache: [L,2,B,kv,S,D] (zeros, kv-major).
    Returns (last_hidden [B,H] f32, last_logits [B,codec_vocab] f32,
    new_kv_cache). Only the last position's hidden/logits are returned —
    that is all generate() consumes (tts_transformer.cpp:1893-1912).
    """
    positions = jnp.broadcast_to(
        jnp.arange(prefill_embd.shape[1], dtype=jnp.int32)[None],
        prefill_embd.shape[:2])
    y, ks, vs = stack_prefill(
        w["layers"], prefill_embd, positions,
        n_heads=cfg.n_attention_heads, n_kv=cfg.n_key_value_heads,
        head_dim=cfg.head_dim, eps=cfg.rms_norm_eps, theta=cfg.rope_theta)
    kv_cache = write_prefill_to_cache(kv_cache, ks, vs, 0)
    h = rms_norm(y[:, -1], w["output_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(h.astype(w["codec_head"].dtype), w["codec_head"],
                     preferred_element_type=jnp.float32)
    return h, logits, kv_cache


# Talker decode-step implementation switch (mirrors
# models/code_predictor._resolve_impl). Unlike codepred, "auto" resolves
# to the XLA stack_step for now: the fused megakernel
# (ops/talker_fused.py) is interpret-verified but its compiled-Mosaic
# parity + perf on chip are unmeasured — tools/r4_measure.sh A/Bs it via
# QWEN3_TTS_TALKER=fused; flip this default only on a measured win.
_IMPL = None
_IMPL_VALID = (None, "auto", "fused", "fused_interpret", "xla")
# Flip to True ONLY on a measured on-chip win (parity PASS + step A/B,
# tools/bench_talker_fused.py / r4_measure step 3b). The gating below
# then mirrors code_predictor's: single device only — Mosaic kernels are
# not auto-partitionable under GSPMD (ADVICE r3 medium finding).
_AUTO_FUSED = False


def set_talker_step_impl(impl: str | None) -> None:
    """TRACE-TIME switch: jitted callers bake the impl into compiled
    executables; set before the first decode (or use QWEN3_TTS_TALKER)."""
    global _IMPL
    if impl not in _IMPL_VALID:
        raise ValueError(f"impl must be one of {_IMPL_VALID}")
    _IMPL = impl


def _resolve_impl() -> str:
    if _IMPL is not None:
        return _IMPL
    import os
    impl = os.environ.get("QWEN3_TTS_TALKER", "auto")
    return impl if impl in _IMPL_VALID else "auto"


def talker_step(w, cfg: TalkerConfig, step_embd: jax.Array,
                kv_cache: jax.Array, n_past: jax.Array,
                read_ctx: int | None = None,
                write_idx: jax.Array | None = None,
                valid_mask: jax.Array | None = None,
                window_lo: jax.Array | None = None,
                window_hi: jax.Array | None = None,
                prefill_len: int = 0):
    """Single-frame decode step (build_step_graph, tts_transformer.cpp:1376-1512).

    step_embd: [B, hidden]; n_past: scalar int32 OR [B] int32 — tokens
    already in each stream's cache (per-stream for continuous batching).
    read_ctx (static): attention reads only the first read_ctx cache rows.
    write_idx: optional scalar cache slot overriding per-stream writes —
    in lock-step batches every live stream sits at the same position, so
    one dynamic-update-slice replaces the per-stream scatter (done streams
    get a garbage row beyond their frozen n_valid; never attended).
    Returns (hidden [B,H] f32, logits [B,codec_vocab] f32, new_kv_cache).
    """
    B = step_embd.shape[0]
    if getattr(n_past, "ndim", 0) == 1:
        positions = n_past.astype(jnp.int32)
    else:
        positions = jnp.full((B,), n_past, jnp.int32)
    n_valid = positions + 1

    # Fused decode-step megakernel dispatch (ops/talker_fused.py): one
    # Pallas program for all 28 layers, the TPU mirror of the
    # reference's single step graph enqueue (tts_transformer.cpp:
    # 1376-1512 built once, executed per frame).
    impl = _resolve_impl()
    use_fused = impl in ("fused", "fused_interpret")
    if not use_fused and impl == "auto" and _AUTO_FUSED:
        from ..ops import talker_fused
        widx = write_idx if write_idx is not None else n_past
        # auto: besides supported(), require a single TPU device —
        # Mosaic kernels are not auto-partitionable under GSPMD;
        # multi-chip meshes take the XLA stack_step (explicit
        # impl="fused" still forces the kernel).
        use_fused = (jax.default_backend() == "tpu"
                     and jax.device_count() == 1
                     and talker_fused.supported(cfg, B, w, kv_cache,
                                                widx, valid_mask,
                                                read_ctx))
    if use_fused:
        from ..ops import talker_fused
        widx = write_idx if write_idx is not None else n_past
        if not talker_fused.supported(cfg, B, w, kv_cache, widx,
                                      valid_mask, read_ctx):
            raise ValueError(
                "QWEN3_TTS_TALKER=fused but the fused kernel does not "
                "support this config/batch/cache (see talker_fused"
                ".supported)")
        # Ring lifetime windows (window_lo/hi) are a flash-kernel
        # block-skipping hint only; the bitmask is exact, so the fused
        # kernel ignores them (it reads every block under read_ctx,
        # like the XLA einsum path).
        y, new_cache = talker_fused.talker_step_fused(
            w["layers"], step_embd, positions, kv_cache,
            jnp.asarray(widx, jnp.int32), n_valid,
            n_heads=cfg.n_attention_heads, n_kv=cfg.n_key_value_heads,
            head_dim=cfg.head_dim, eps=cfg.rms_norm_eps,
            theta=cfg.rope_theta, read_ctx=read_ctx,
            valid_mask=valid_mask,
            interpret=(impl == "fused_interpret"))
        h = rms_norm(y, w["output_norm"], cfg.rms_norm_eps)
        logits = jnp.dot(h.astype(w["codec_head"].dtype), w["codec_head"],
                         preferred_element_type=jnp.float32)
        return h, logits, new_cache

    y, kv_cache = stack_step(
        w["layers"], step_embd, positions, kv_cache,
        write_idx if write_idx is not None else n_past, n_valid,
        n_heads=cfg.n_attention_heads, n_kv=cfg.n_key_value_heads,
        head_dim=cfg.head_dim, eps=cfg.rms_norm_eps, theta=cfg.rope_theta,
        read_ctx=read_ctx, valid_mask=valid_mask,
        window_lo=window_lo, window_hi=window_hi, prefill_len=prefill_len)
    h = rms_norm(y, w["output_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(h.astype(w["codec_head"].dtype), w["codec_head"],
                     preferred_element_type=jnp.float32)
    return h, logits, kv_cache
