"""Batched autoregressive generation: the hot loop, fully on-device.

TPU-native rebuild of TTSTransformer::generate
(tts_transformer.cpp:2342-2574). Where the reference runs a C++ loop with
4+ host<->device transfers per frame (SURVEY.md §3.2 "device boundaries"),
here each 40-frame chunk is ONE jitted lax.scan:

  sample CB0 (suppression/penalty/EOS-ramp/top-k) ->
  16-codebook predictor scan -> next-step embedding ->
  talker decode step

with the talker KV cache donated across chunks. The 40-frame chunk size
matches the reference's streaming-vocoder callback interval
(qwen3_tts.cpp:459-463, callback_interval=40), so the host only sees
[40, B, 16] int32 codes + a done mask per chunk.

Everything carries a batch dimension: concurrent streams share each step's
MXU work — the core of the >=16-streams/chip serving design (BASELINE.md).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..models import code_predictor, talker
from ..models.stack import init_kv_cache
from ..ops.sampling import sample_cb0


# Ring-slot cache: lane rows [0..RING_PREFILL_SLOTS) are the per-stream
# prefill region (admissions write there); rows beyond are the shared ring
# written at GenState.write_slot. Must be >= any prefill length (10 for
# the think/language path).
RING_PREFILL_SLOTS = 16


def kv_quant_enabled() -> bool:
    """QWEN3_TTS_KV=int8 selects the int8 talker KV cache (stack.QuantKV):
    half the KV memory + decode-read bandwidth. Default bf16."""
    import os
    return os.environ.get("QWEN3_TTS_KV", "bf16").lower() == "int8"


def kv_layered_enabled() -> bool:
    """QWEN3_TTS_CACHE=layered selects the per-layer-buffer talker cache
    (tuple of L [2,B,kv,S,D] arrays) instead of one stacked [L,...] array.
    Slicing layer l out of the stacked buffer inside the decode loop makes
    XLA materialize the full [2,B,kv,S,D] slice per layer (hundreds of MB
    per frame at serving batch); per-layer buffers alias in place
    (models/stack.init_kv_cache, NOTES.md round 3)."""
    import os
    return os.environ.get("QWEN3_TTS_CACHE", "stacked").lower() == "layered"



class GenState(NamedTuple):
    kv_cache: jax.Array       # [L, 2, B, kv, S, D] bf16 (kv-major), or
    #                           stack.QuantKV (int8), or the layered
    #                           layout: tuple of L per-layer buffers
    n_past: jax.Array         # [B] int32 — per-stream LOGICAL position
    frame_idx: jax.Array      # [B] int32 — per-stream frames generated
    last_hidden: jax.Array    # [B, H] f32
    logits: jax.Array         # [B, codec_vocab] f32
    seen_mask: jax.Array      # [B, codec_vocab] bool — emitted CB0 ids
    done: jax.Array           # [B] bool — stream hit EOS (or was inactive)
    key: jax.Array            # PRNG key
    # ring-slot cache fields (continuous batching; unused in lock-step):
    valid_mask: jax.Array     # [B, S] bool — which cache slots each stream
    #                           may attend (slots are NOT position-ordered)
    write_slot: jax.Array     # scalar int32 — next ring slot to write
    ring_lo: jax.Array        # [B] int32 — ring slot at admission; each
    #                           stream's valid ring slots lie in the
    #                           modular window [ring_lo, write_slot]


class GenConsts(NamedTuple):
    """Per-utterance constants threaded through the chunk scan."""
    trailing_hidden: jax.Array   # [B, T_trail, H]
    trailing_len: jax.Array      # [B]
    tts_pad_embed: jax.Array     # [B, H]
    expected_frames: jax.Array   # [B] — EOS ramp threshold
    temperature: jax.Array       # scalar f32
    repetition_penalty: jax.Array  # scalar f32


@partial(jax.jit, static_argnames=("cfg", "max_ctx", "kv_quant",
                                   "kv_layered"))
def init_state(w, cfg: TalkerConfig, prefill: talker.PrefillInputs,
               max_ctx: int, key: jax.Array,
               active: jax.Array | None = None,
               kv_quant: bool = False,
               kv_layered: bool = False) -> GenState:
    """Run the prefill and build the generation state.

    max_ctx must cover prefill_len + max frames + slack
    (the reference sizes its cache prefill+max_len+8,
    tts_transformer.cpp:2383-2388).
    `active`: [B] bool — streams that actually hold a request (for
    partially-filled serving batches).
    `kv_quant`: int8 talker KV cache (stack.QuantKV) — halves KV memory
    and decode-attention read bandwidth (allowed: the reference's bf16
    constraint binds the code predictor only, README.md:72).
    `kv_layered`: per-layer cache buffers instead of one stacked [L,...]
    array (see kv_layered_enabled / stack.init_kv_cache).
    """
    B, P, H = prefill.prefill_embd.shape
    cache = init_kv_cache(cfg.n_layers, B, max_ctx,
                          cfg.n_key_value_heads, cfg.head_dim,
                          quant=kv_quant, layered=kv_layered)
    hidden, logits, cache = talker.talker_prefill(
        w, cfg, prefill.prefill_embd, cache)
    done = jnp.zeros((B,), bool) if active is None else ~active
    state = GenState(
        kv_cache=cache,
        n_past=jnp.full((B,), P, jnp.int32),
        frame_idx=jnp.zeros((B,), jnp.int32),
        last_hidden=hidden,
        logits=logits,
        seen_mask=jnp.zeros((B, cfg.codec_vocab_size), bool),
        done=done,
        key=key,
        valid_mask=jnp.broadcast_to(
            jnp.arange(max_ctx)[None, :] < P, (B, max_ctx)),
        write_slot=jnp.int32(max(P, RING_PREFILL_SLOTS)),
        ring_lo=jnp.full((B,), max(P, RING_PREFILL_SLOTS), jnp.int32),
    )
    return state


def expected_frames(n_text_tokens: jax.Array) -> jax.Array:
    """EOS-ramp threshold (tts_transformer.cpp:2439-2445): after
    max(20, 4*n_text_tokens) frames the EOS logit is blended upward.
    Single definition shared by make_consts and admit_slots so initial
    and mid-serve-admitted streams can never diverge in ramp policy."""
    return jnp.maximum(20, n_text_tokens * 4).astype(jnp.int32)


def make_consts(prefill: talker.PrefillInputs, temperature: float,
                repetition_penalty: float) -> GenConsts:
    expected = expected_frames(prefill.n_text_tokens)
    return GenConsts(
        trailing_hidden=prefill.trailing_hidden,
        trailing_len=prefill.trailing_len,
        tts_pad_embed=prefill.tts_pad_embed,
        expected_frames=expected,
        temperature=jnp.float32(temperature),
        repetition_penalty=jnp.float32(repetition_penalty),
    )


@partial(jax.jit,
         static_argnames=("cfg", "top_k", "chunk_frames", "greedy",
                          "read_ctx", "lockstep", "ring", "top_p"),
         donate_argnames=("state",))
def generate_chunk(w, cfg: TalkerConfig, state: GenState, consts: GenConsts,
                   top_k: int, chunk_frames: int = 40,
                   greedy: bool = False, read_ctx: int | None = None,
                   lockstep: bool = False, ring: bool = False,
                   top_p: float = 1.0):
    """Generate up to `chunk_frames` frames for every stream in the batch.

    Returns (new_state, codes [chunk, B, 16] int32, valid [chunk, B] bool).
    A frame is valid iff the stream was live and did not sample EOS at that
    step (EOS frames are not emitted — tts_transformer.cpp:2497-2499).

    read_ctx (static): cap on attention's cache read window for this
    chunk; the caller guarantees max(n_past) + chunk_frames <= read_ctx —
    in ring mode write_slot + chunk_frames <= read_ctx instead.
    One compiled executable per distinct bucket.

    ring (static): ring-slot cache mode for continuous batching — every
    lane writes at the shared scalar write_slot (no per-stream scatter) and
    attention masks by the per-slot validity bitmask. Cache slots are then
    NOT position-ordered; RoPE keeps logical per-stream positions.

    top_p (static): optional nucleus filter after top-k, applied to both
    CB0 and code-predictor sampling (ops/sampling.apply_top_p). The
    default 1.0 compiles to the exact pre-top_p program; < 1.0 routes
    the code predictor to its XLA path (the fused kernel samples
    in-kernel). A working extension over the reference, which accepts
    --top-p but never applies it.
    """
    n_cb = cfg.n_codebooks

    def step(state: GenState, _):
        key, k_cb0, k_codes = jax.random.split(state.key, 3)

        cb0 = sample_cb0(
            state.logits, state.seen_mask, state.frame_idx,
            consts.expected_frames, consts.repetition_penalty,
            consts.temperature, top_k, k_cb0,
            eos_id=cfg.codec_eos_id,
            suppress_start=cfg.codec_vocab_size - 1024, greedy=greedy,
            top_p=top_p)

        is_eos = cb0 == cfg.codec_eos_id
        valid = ~state.done & ~is_eos
        done = state.done | is_eos
        cb0_safe = jnp.where(valid, cb0, 0)

        seen = state.seen_mask.at[jnp.arange(cb0.shape[0]), cb0_safe].set(
            jnp.where(valid, True,
                      state.seen_mask[jnp.arange(cb0.shape[0]), cb0_safe]))

        rest = code_predictor.predict_codes(
            w, cfg, state.last_hidden, cb0_safe,
            consts.temperature, top_k, k_codes, greedy=greedy,
            top_p=top_p)
        frame_codes = jnp.concatenate([cb0_safe[:, None], rest], axis=1)

        # next-step embedding: codec+code-pred embeds + trailing text row
        # (or tts_pad once the text schedule is exhausted,
        # tts_transformer.cpp:2548-2553); per-stream frame indices
        t_trail = consts.trailing_hidden.shape[1]
        row_idx = jnp.clip(state.frame_idx, 0, t_trail - 1)
        trail_row = jnp.take_along_axis(
            consts.trailing_hidden, row_idx[:, None, None], axis=1)[:, 0]
        trail_row = jnp.where(
            (state.frame_idx < consts.trailing_len)[:, None],
            trail_row, consts.tts_pad_embed)
        step_embd = code_predictor.frame_step_embedding(
            w, cfg, frame_codes, trail_row)

        if ring:
            # ring mode: shared scalar write slot; the just-written row is
            # valid for live streams only (dead lanes get garbage + a
            # cleared bit). Attention uses the bitmask, bounded by each
            # stream's [ring_lo, slot+1) lifetime window so the flash
            # kernel fetches only blocks the stream can have touched.
            slot = state.write_slot
            new_mask = state.valid_mask.at[:, slot].set(~done)
            hidden, logits, cache = talker.talker_step(
                w, cfg, step_embd, state.kv_cache, state.n_past,
                read_ctx=read_ctx, write_idx=slot, valid_mask=new_mask,
                window_lo=state.ring_lo, window_hi=slot + 1,
                prefill_len=RING_PREFILL_SLOTS)
            S = state.valid_mask.shape[1]
            ring_start = jnp.int32(RING_PREFILL_SLOTS)
            next_slot = jnp.where(slot + 1 >= S, ring_start, slot + 1)
        else:
            # lock-step batches share one write slot (all live streams sit
            # at the same depth) -> scalar dynamic-update-slice, no scatter
            write_idx = jnp.max(state.n_past) if lockstep else None
            hidden, logits, cache = talker.talker_step(
                w, cfg, step_embd, state.kv_cache, state.n_past,
                read_ctx=read_ctx, write_idx=write_idx)
            new_mask = state.valid_mask
            next_slot = state.write_slot

        # Done streams freeze: their position stops advancing so a parked
        # slot never walks off the end of the cache while waiting for a
        # new request (continuous batching).
        advance = (~done).astype(jnp.int32)
        new_state = GenState(
            kv_cache=cache,
            n_past=state.n_past + advance,
            frame_idx=state.frame_idx + advance,
            last_hidden=hidden,
            logits=logits,
            seen_mask=seen,
            done=done,
            key=key,
            valid_mask=new_mask,
            write_slot=next_slot,
            ring_lo=state.ring_lo,
        )
        return new_state, (frame_codes, valid)

    state, (codes, valid) = jax.lax.scan(step, state, None,
                                         length=chunk_frames)
    return state, codes, valid


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("state", "consts"))
def admit_slots(w, cfg: TalkerConfig, state: GenState, consts: GenConsts,
                slots: jax.Array, prefill: talker.PrefillInputs):
    """Splice K new requests into slots `slots` of a live serving batch.

    Runs ONE batched K-row prefill and writes every request's K/V +
    per-slot state/consts rows in place (donated buffers) — the
    continuous-batching primitive the reference's serial server
    (main.cpp:109-163) has no analogue of: other streams keep generating
    between chunks while slots turn over. Batching matters because each
    jitted dispatch costs a host round-trip: admitting a full turnover
    one-by-one serialized K dispatches.

    slots: [K] int32 (duplicates allowed — later entries win, so callers
    may pad K to a fixed shape by repeating the last real admission).
    prefill: PrefillInputs with leading dim K; trailing_hidden must
    already be padded/truncated to consts.trailing_hidden.shape[1].
    """
    from ..models.stack import (QuantKV, is_layered, quantize_kv_rows,
                                stack_prefill)
    from ..ops.layers import rms_norm

    K, P = prefill.prefill_embd.shape[:2]
    # Ring-cache invariant: admissions write prefill rows [0..P); a prefill
    # longer than the reserved region would silently corrupt the shared
    # ring (slots >= RING_PREFILL_SLOTS are rewritten every step).
    assert P <= RING_PREFILL_SLOTS, (
        f"prefill length {P} exceeds RING_PREFILL_SLOTS "
        f"{RING_PREFILL_SLOTS}; raise RING_PREFILL_SLOTS")
    positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None],
                                 (K, P))
    y, ks, vs = stack_prefill(
        w["layers"], prefill.prefill_embd, positions,
        n_heads=cfg.n_attention_heads, n_kv=cfg.n_key_value_heads,
        head_dim=cfg.head_dim, eps=cfg.rms_norm_eps, theta=cfg.rope_theta)
    h = rms_norm(y[:, -1], w["output_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(h.astype(w["codec_head"].dtype), w["codec_head"],
                     preferred_element_type=jnp.float32)

    # Duplicate slots must resolve last-wins, but XLA scatter order with
    # duplicate indices is unspecified — so rewrite every entry's payload
    # to its LAST occurrence's: colliding writes then carry identical data
    # and any write order (scatter or sequential) gives the same result.
    last = jnp.max(jnp.where(slots[:, None] == slots[None, :],
                             jnp.arange(K)[None, :], -1), axis=1)
    dd = lambda a: jnp.take(a, last, axis=0)     # dedup along the K axis

    kv = jnp.stack([ks, vs], axis=1)
    kv = kv.transpose(0, 1, 2, 4, 3, 5)          # [L,2,K,kv,P,D] kv-major
    cache = state.kv_cache                       # [L,2,B,kv,S,D] or layered
    if is_layered(cache):
        # ONE scatter per layer (vs. K sequential DUS x 28 layers, a
        # compile-size bomb at K=96) — safe because of the dedup above.
        layers = []
        for l, cl in enumerate(cache):
            kv_l = kv[l][:, last]                # [2,K,kv,P,D] deduped
            if isinstance(cl, QuantKV):
                qv, qs = quantize_kv_rows(kv_l)
                layers.append(QuantKV(
                    values=cl.values.at[:, slots, :, :P, :].set(qv),
                    scales=cl.scales.at[:, slots, :, :P].set(qs)))
            else:
                layers.append(
                    cl.at[:, slots, :, :P, :].set(kv_l.astype(cl.dtype)))
        cache = tuple(layers)
    elif isinstance(cache, QuantKV):
        qv, qs = quantize_kv_rows(kv[:, :, last])
        cache = QuantKV(
            values=cache.values.at[:, :, slots, :, :P, :].set(qv),
            scales=cache.scales.at[:, :, slots, :, :P].set(qs))
    else:
        cache = cache.at[:, :, slots, :, :P, :].set(
            kv[:, :, last].astype(cache.dtype))

    expected = expected_frames(prefill.n_text_tokens)
    S = state.valid_mask.shape[1]
    prefix_mask = jnp.broadcast_to(jnp.arange(S) < P, (K, S))
    new_state = GenState(
        kv_cache=cache,
        n_past=state.n_past.at[slots].set(P),
        frame_idx=state.frame_idx.at[slots].set(0),
        last_hidden=state.last_hidden.at[slots].set(dd(h)),
        logits=state.logits.at[slots].set(dd(logits)),
        seen_mask=state.seen_mask.at[slots].set(False),
        done=state.done.at[slots].set(False),
        key=state.key,
        valid_mask=state.valid_mask.at[slots].set(prefix_mask),
        write_slot=state.write_slot,
        ring_lo=state.ring_lo.at[slots].set(state.write_slot),
    )
    new_consts = GenConsts(
        trailing_hidden=consts.trailing_hidden.at[slots].set(
            dd(prefill.trailing_hidden)),
        trailing_len=consts.trailing_len.at[slots].set(
            dd(prefill.trailing_len)),
        tts_pad_embed=consts.tts_pad_embed.at[slots].set(
            dd(prefill.tts_pad_embed)),
        expected_frames=consts.expected_frames.at[slots].set(dd(expected)),
        temperature=consts.temperature,
        repetition_penalty=consts.repetition_penalty,
    )
    return new_state, new_consts


def admit_slot(w, cfg: TalkerConfig, state: GenState, consts: GenConsts,
               slot: jax.Array, prefill: talker.PrefillInputs):
    """Single-request admission (K=1 wrapper around admit_slots)."""
    return admit_slots(w, cfg, state, consts,
                       jnp.asarray(slot, jnp.int32)[None], prefill)


@partial(jax.jit, donate_argnames=("state",))
def park_slot(state: GenState, slot: jax.Array) -> GenState:
    """Mark a slot done on-device (used when a request is retired by its
    frame cap rather than by sampling EOS) so the stream stops advancing
    its cache position until a new request is admitted."""
    return state._replace(done=state.done.at[slot].set(True))


def required_ctx(prefill_len: int, max_frames: int, chunk: int = 40,
                 align: int = 128) -> int:
    """Talker cache size: prefill + frames rounded up to whole chunks +
    slack, aligned for the TPU lane dimension."""
    n_chunks = -(-max_frames // chunk)
    need = prefill_len + n_chunks * chunk + 8
    return -(-need // align) * align


def required_ctx_ring(max_frames: int, chunk: int = 40,
                      align: int = 128) -> int:
    """Cache size for ring mode: prefill region + ring capacity.

    A stream may consume up to max_frames + (chunk - 1) ring slots before
    its frame cap retires it at a chunk boundary, and must never wrap into
    its own rows."""
    need = RING_PREFILL_SLOTS + max_frames + chunk + 8
    return -(-need // align) * align


def ctx_bucket(max_n_past: int, chunk: int, total_ctx: int,
               bucket: int = 512) -> int:
    """Static attention read-window for the next chunk: covers every
    stream's position plus the chunk, rounded up to `bucket` (one compile
    per bucket), capped at the allocated context."""
    need = max_n_past + chunk + 1
    return min(-(-need // bucket) * bucket, total_ctx)
