"""On-device sampling: temperature/top-k, CB0 suppression, HF repetition
penalty, EOS ramp-boost.

TPU-native replacement for both the reference's CPU sampling in the
generation loop (tts_transformer.cpp:2416-2495) and its custom CUDA
sampling kernels (trt_cuda_kernels.cu:18-64, :91-190): everything runs
inside the jitted step, no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def apply_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    """Keep logits >= the k-th largest; others -> -inf.

    Matches the reference's threshold semantics (ties at the threshold all
    survive — tts_transformer.cpp:2458-2472).
    """
    vocab = logits.shape[-1]
    if top_k <= 0 or top_k >= vocab:
        return logits
    vals = jax.lax.top_k(logits, top_k)[0]
    threshold = vals[..., -1:]
    return jnp.where(logits < threshold, NEG_INF, logits)


def apply_top_p(scaled: jax.Array, top_p: float, top_k: int) -> jax.Array:
    """Nucleus (top-p) filter: keep the smallest prefix of descending-
    probability tokens whose cumulative mass reaches top_p; the boundary
    token that crosses top_p is kept (HF semantics), so at least one
    token always survives.

    Composed AFTER top-k, so only the <= top_k surviving entries can
    carry mass and the sort is top_k-wide instead of vocab-wide (the
    -inf'd rest contributes zero probability).

    This is a WORKING extension over the reference, which accepts
    --top-p (qwen3_tts.h:26, main.cpp:205) but never applies it — its
    sampler (tts_transformer.cpp:2447-2495) only implements top-k.
    Callers compile the filter out entirely at the default top_p >= 1.0.
    """
    vocab = scaled.shape[-1]
    k = top_k if 0 < top_k < vocab else vocab
    vals = jax.lax.top_k(scaled, k)[0]                    # desc-sorted
    probs = jax.nn.softmax(vals, axis=-1)                 # -inf rows -> 0
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) <= top_p                         # first always kept
    kth = jnp.min(jnp.where(keep, vals, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(scaled < kth, NEG_INF, scaled)


@partial(jax.jit, static_argnames=("top_k", "greedy", "top_p"))
def sample_codes(logits: jax.Array, temperature: jax.Array, top_k: int,
                 key: jax.Array, greedy: bool = False,
                 top_p: float = 1.0) -> jax.Array:
    """Temperature + top-k (+ optional nucleus) sampling for
    code-predictor logits.

    Mirrors sample_or_argmax (tts_transformer.cpp:2198-2236); greedy when
    temperature <= 0 (argmax picks the first maximum, like the reference's
    linear scan at :2051-2061). Pass greedy=True (static) to compile out
    the top-k/categorical work entirely. top_p is static too: the default
    1.0 adds no ops (the reference accepts but ignores top_p; here it
    works when requested — apply_top_p).
    logits: [B, V] f32 -> [B] int32.
    """
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = apply_top_k(logits / jnp.maximum(temperature, 1e-6), top_k)
    if top_p < 1.0:
        scaled = apply_top_p(scaled, top_p, top_k)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, g, sampled)


@partial(jax.jit, static_argnames=("top_k", "eos_id", "suppress_start",
                                   "greedy", "top_p"))
def sample_cb0(logits: jax.Array, seen_mask: jax.Array,
               frame_idx: jax.Array, expected_frames: jax.Array,
               repetition_penalty: jax.Array, temperature: jax.Array,
               top_k: int, key: jax.Array, *,
               eos_id: int, suppress_start: int,
               greedy: bool = False, top_p: float = 1.0) -> jax.Array:
    """First-codebook sampling with the exact reference pipeline order
    (tts_transformer.cpp:2416-2495):

      1. suppress ids in [suppress_start, V) except EOS
      2. HF repetition penalty over previously emitted CB0 ids
      3. EOS ramp-boost after max(20, 4*n_text_tokens) frames
      4. greedy argmax, or temperature -> top-k (EOS survives) ->
         optional nucleus filter (top_p; EOS survives it too, so
         termination stays reachable) -> sample

    logits: [B, V] f32; seen_mask: [B, V] bool; frame_idx: [B] int32
    (per-stream frame counters); expected_frames: [B]; returns [B] int32.
    """
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)

    # 1. suppression window (tts_transformer.cpp:2404, 2417-2422)
    suppress = (ids >= suppress_start) & (ids != eos_id)
    logits = jnp.where(suppress[None, :], NEG_INF, logits)

    # 2. HF-style repetition penalty (:2425-2435)
    penalized = jnp.where(logits > 0.0,
                          logits / repetition_penalty,
                          logits * repetition_penalty)
    logits = jnp.where(seen_mask, penalized, logits)

    # 3. EOS ramp (:2439-2445) — before temperature, so it affects both paths
    exp_f = expected_frames.astype(jnp.float32)
    ramp = jnp.clip((frame_idx.astype(jnp.float32) - exp_f) / exp_f, 0.0, 1.0)
    active = frame_idx >= expected_frames
    max_lg = jnp.max(logits, axis=-1)
    target = max_lg + 5.0
    eos_lg = logits[:, eos_id]
    boosted = eos_lg + jnp.where(active, ramp, 0.0) * (target - eos_lg)
    logits = logits.at[:, eos_id].set(boosted)

    # 4. sample (:2447-2495)
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy:
        return g
    scaled = logits / jnp.maximum(temperature, 1e-6)
    eos_saved = scaled[:, eos_id]
    filtered = apply_top_k(scaled, top_k)
    # EOS always survives top-k (:2474-2475)
    filtered = filtered.at[:, eos_id].set(eos_saved)
    if top_p < 1.0:
        # nucleus filter over the survivors (top_k + possibly-restored
        # EOS = up to top_k+1 finite entries); EOS is re-restored after
        # so the reference's "EOS always sampleable" invariant — which
        # the EOS-ramp termination relies on — holds under top_p too
        filtered = apply_top_p(filtered, top_p, top_k + 1)
        filtered = filtered.at[:, eos_id].set(eos_saved)
    sampled = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, g, sampled)
