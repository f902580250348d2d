"""Nucleus (top-p) sampling: a WORKING extension over the reference,
which accepts --top-p (qwen3_tts.h:26, main.cpp:205) but never applies
it (its sampler tts_transformer.cpp:2447-2495 is top-k only).

Contract: top_p = 1.0 is a compile-time no-op (bit-identical programs);
top_p < 1.0 filters to the HF nucleus (smallest descending-probability
prefix reaching top_p mass, boundary token kept) after top-k, with EOS
kept sampleable in the CB0 path (the EOS-ramp termination depends on
it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops.sampling import (NEG_INF, apply_top_k, apply_top_p,
                                        sample_cb0, sample_codes)


def hf_nucleus_mask(logits_row: np.ndarray, top_p: float) -> np.ndarray:
    """Reference semantics (HF TopPLogitsWarper): sort descending,
    remove tokens whose EXCLUSIVE cumulative probability exceeds top_p
    (i.e. keep while cum[i-1] <= top_p, so the boundary token stays)."""
    order = np.argsort(-logits_row, kind="stable")
    probs = np.exp(logits_row[order] - logits_row[order].max())
    probs = probs / probs.sum()
    cum = np.cumsum(probs)
    keep_sorted = (cum - probs) <= top_p
    keep = np.zeros_like(keep_sorted)
    keep[order] = keep_sorted
    return keep


@pytest.mark.parametrize("top_p", [0.1, 0.5, 0.9])
def test_apply_top_p_matches_hf_semantics(rng, top_p):
    logits = jnp.asarray(rng.standard_normal((4, 64)) * 3, jnp.float32)
    got = np.asarray(apply_top_p(logits, top_p, 64))
    for b in range(4):
        row = np.asarray(logits[b], np.float32)
        keep = hf_nucleus_mask(row, top_p)
        # ties at the boundary value may all survive (threshold
        # semantics, like apply_top_k); random floats make ties
        # measure-zero, so exact agreement is expected here
        kept = got[b] > NEG_INF / 2
        np.testing.assert_array_equal(kept, keep, err_msg=f"row {b}")
        # surviving logits unchanged
        np.testing.assert_array_equal(got[b][kept], row[keep])


def test_apply_top_p_always_keeps_argmax():
    # top_p=0: only the highest-probability token survives
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]], jnp.float32)
    got = np.asarray(apply_top_p(logits, 0.0, 4))
    assert (got[0] > NEG_INF / 2).sum() == 1
    assert got[0, 1] == 5.0


def test_apply_top_p_composes_with_top_k(rng):
    """top-k first, then nucleus over the k survivors only."""
    logits = jnp.asarray(rng.standard_normal((2, 32)) * 2, jnp.float32)
    k = 8
    masked = apply_top_k(logits, k)
    got = np.asarray(apply_top_p(masked, 0.6, k))
    for b in range(2):
        kept = got[b] > NEG_INF / 2
        # nucleus of the top-k-masked row (NEG_INF entries have ~0 prob)
        keep = hf_nucleus_mask(np.asarray(masked[b], np.float32), 0.6)
        # top-k -inf rows technically "survive" the mask check once the
        # nucleus is exhausted; they carry zero probability either way —
        # compare only over finite entries
        finite = np.asarray(masked[b]) > NEG_INF / 2
        np.testing.assert_array_equal(kept[finite], keep[finite])
        assert kept.sum() <= k


def test_sample_codes_top_p_default_identity(rng):
    """top_p=1.0 must not change the sampled stream (same program)."""
    logits = jnp.asarray(rng.standard_normal((8, 128)) * 2, jnp.float32)
    key = jax.random.PRNGKey(7)
    t = jnp.float32(0.9)
    a = np.asarray(sample_codes(logits, t, 50, key))
    b = np.asarray(sample_codes(logits, t, 50, key, top_p=1.0))
    np.testing.assert_array_equal(a, b)


def test_sample_codes_top_p_restricts_support(rng):
    """With a tiny nucleus every draw must come from it."""
    logits = jnp.asarray(rng.standard_normal((16, 64)) * 4, jnp.float32)
    t = jnp.float32(1.0)
    draws = []
    for s in range(32):
        draws.append(np.asarray(sample_codes(
            logits, t, 0, jax.random.PRNGKey(s), top_p=0.25)))
    draws = np.stack(draws)                     # [32, 16]
    for b in range(16):
        nucleus = set(np.flatnonzero(
            hf_nucleus_mask(np.asarray(logits[b], np.float32), 0.25)))
        assert set(draws[:, b].tolist()) <= nucleus


def test_sample_cb0_top_p_keeps_eos_sampleable(rng):
    """EOS must survive the nucleus filter (termination invariant)."""
    B, V, eos = 4, 64, 62
    logits = np.asarray(rng.standard_normal((B, V)) * 2, np.float32)
    logits[:, eos] = -6.0          # far outside any nucleus
    seen = jnp.zeros((B, V), bool)
    # frame_idx far past expected -> full EOS ramp boosts it to max+5,
    # making EOS the argmax; with top_p tiny it MUST still be drawable
    out = sample_cb0(jnp.asarray(logits), seen,
                     jnp.full((B,), 400, jnp.int32),
                     jnp.full((B,), 20, jnp.int32),
                     jnp.float32(1.05), jnp.float32(0.9), 8,
                     jax.random.PRNGKey(0), eos_id=eos,
                     suppress_start=V - 2, top_p=0.3)
    assert (np.asarray(out) == eos).all()


def test_sample_cb0_top_p_default_identity(rng):
    logits = jnp.asarray(rng.standard_normal((4, 64)) * 2, jnp.float32)
    seen = jnp.zeros((4, 64), bool)
    args = (logits, seen, jnp.zeros((4,), jnp.int32),
            jnp.full((4,), 20, jnp.int32), jnp.float32(1.05),
            jnp.float32(0.9), 8, jax.random.PRNGKey(3))
    kw = dict(eos_id=62, suppress_start=62)
    a = np.asarray(sample_cb0(*args, **kw))
    b = np.asarray(sample_cb0(*args, top_p=1.0, **kw))
    np.testing.assert_array_equal(a, b)


def test_predict_codes_top_p_routes_off_fused(rng):
    """top_p < 1.0 must not reach the fused kernel (it samples
    in-kernel with no nucleus path): forced fused raises, auto falls
    back to the XLA scan and still returns valid codes."""
    from qwen3_tts_tpu.models import code_predictor
    from qwen3_tts_tpu.models.weights import (init_talker_weights,
                                              tiny_talker_config)
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(0), cfg)
    B = 2
    hidden = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)),
                         jnp.float32)
    cb0 = jnp.zeros((B,), jnp.int32)
    code_predictor.set_codepred_impl("fused_interpret")
    try:
        with pytest.raises(ValueError, match="top_p"):
            code_predictor.predict_codes(
                w, cfg, hidden, cb0, jnp.float32(0.9), 8,
                jax.random.PRNGKey(0), top_p=0.9)
        code_predictor.set_codepred_impl("auto")
        codes = code_predictor.predict_codes(
            w, cfg, hidden, cb0, jnp.float32(0.9), 8,
            jax.random.PRNGKey(0), top_p=0.9)
        assert codes.shape == (B, cfg.n_codebooks - 1)
        assert (np.asarray(codes) >= 0).all()
    finally:
        code_predictor.set_codepred_impl(None)
