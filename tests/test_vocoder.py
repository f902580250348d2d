"""Vocoder tests: conv primitive semantics, shapes, causality,
chunked-vs-full boundary behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import vocoder
from qwen3_tts_tpu.models.vocoder import (
    causal_conv1d, conv_transpose1d, snake, tiny_vocoder_config,
    init_vocoder_weights, vocoder_decode)


def manual_conv_transpose(x, w, stride):
    """Scatter-add reference for ConvTranspose1d (torch semantics)."""
    B, T, Cin = x.shape
    Cin2, Cout, K = w.shape
    out = np.zeros((B, (T - 1) * stride + K, Cout), np.float32)
    for b in range(B):
        for t in range(T):
            for k in range(K):
                out[b, t * stride + k] += x[b, t] @ w[:, :, k]
    return out


def test_conv_transpose_matches_scatter(rng):
    x = rng.standard_normal((2, 5, 3)).astype(np.float32)
    w = rng.standard_normal((3, 4, 6)).astype(np.float32)
    for stride in (2, 3, 5):
        got = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), stride))
        want = manual_conv_transpose(x, w, stride)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_causal_conv_matches_manual(rng):
    x = rng.standard_normal((1, 8, 2)).astype(np.float32)
    w = rng.standard_normal((3, 2, 3)).astype(np.float32)  # [out,in,k]
    got = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w), None))
    # manual: left pad k-1 zeros
    xp = np.concatenate([np.zeros((1, 2, 2), np.float32), x], axis=1)
    want = np.zeros((1, 8, 3), np.float32)
    for t in range(8):
        for k in range(3):
            want[0, t] += xp[0, t + k] @ w[:, :, k].T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_causal_conv_dilation(rng):
    x = rng.standard_normal((1, 10, 1)).astype(np.float32)
    w = rng.standard_normal((1, 1, 3)).astype(np.float32)
    d = 3
    got = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w), None,
                                   dilation=d))
    xp = np.concatenate([np.zeros((1, d * 2, 1), np.float32), x], axis=1)
    want = np.zeros((1, 10, 1), np.float32)
    for t in range(10):
        want[0, t, 0] = sum(xp[0, t + k * d, 0] * w[0, 0, k] for k in range(3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_snake_formula():
    x = jnp.asarray(np.linspace(-2, 2, 12).reshape(1, 4, 3), jnp.float32)
    alpha = jnp.asarray([0.1, 0.0, -0.5], jnp.float32)
    beta = jnp.asarray([0.2, 0.0, 0.3], jnp.float32)
    got = np.asarray(snake(x, alpha, beta))
    xn = np.asarray(x)
    want = xn + np.exp(-np.asarray(beta)) * np.sin(np.exp(np.asarray(alpha)) * xn) ** 2
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def voc():
    cfg = tiny_vocoder_config()
    w = init_vocoder_weights(np.random.default_rng(21), cfg)
    return cfg, w


def test_decode_shape_and_rate(voc):
    cfg, w = voc
    B, F = 2, 12
    codes = jnp.asarray(np.random.default_rng(22).integers(
        0, cfg.codebook_size, (B, F, cfg.n_codebooks)), jnp.int32)
    audio = vocoder_decode(w, cfg, codes)
    expect = vocoder.vocoder_output_length(w, cfg, F)
    assert audio.shape == (B, expect)
    # close to samples_per_frame per frame, minus the convT edge trims
    assert F * cfg.samples_per_frame * 0.8 < expect <= F * cfg.samples_per_frame
    assert np.all(np.abs(np.asarray(audio)) <= 1.0)  # tanh output


def test_decode_causality(voc):
    """Changing a late frame's codes must not affect early audio.

    The decoder convT trims (K-rate) from the left too
    (audio_tokenizer_decoder.cpp:601-609), which introduces ~1 frame of
    lookahead per decoder block — so we assert exactness up to a
    2-frame margin before the edited frame (this bounded lookahead is
    what makes the reference's 40-frame streaming chunks sound seamless).
    """
    cfg, w = voc
    F = 10
    rng = np.random.default_rng(23)
    codes = rng.integers(0, cfg.codebook_size, (1, F, cfg.n_codebooks))
    codes2 = codes.copy()
    codes2[0, -1] = (codes2[0, -1] + 7) % cfg.codebook_size
    a1 = np.asarray(vocoder_decode(w, cfg, jnp.asarray(codes, jnp.int32)))
    a2 = np.asarray(vocoder_decode(w, cfg, jnp.asarray(codes2, jnp.int32)))
    spf = cfg.samples_per_frame
    safe = (F - 3) * spf
    np.testing.assert_array_equal(a1[:, :safe], a2[:, :safe])
    assert np.any(a1 != a2)


def test_decode_prefix_consistency(voc):
    """decode(codes[:k]) agrees with decode(codes) on the shared prefix
    (up to the bounded convT lookahead margin)."""
    cfg, w = voc
    F, k = 8, 5
    codes = np.random.default_rng(24).integers(
        0, cfg.codebook_size, (1, F, cfg.n_codebooks))
    full = np.asarray(vocoder_decode(w, cfg, jnp.asarray(codes, jnp.int32)))
    part = np.asarray(vocoder_decode(w, cfg, jnp.asarray(codes[:, :k], jnp.int32)))
    safe = (k - 3) * cfg.samples_per_frame
    np.testing.assert_allclose(part[0, :safe], full[0, :safe], atol=1e-4)


def test_causal_trim_exact_sample_count(voc):
    """trim='causal' emits exactly F * samples_per_frame samples — the
    reference TRT engine's fixed arithmetic (trt_vocoder.cpp:151-166,
    trt_vocoder.h:50)."""
    cfg, w = voc
    for F in (1, 7, 12):
        codes = jnp.asarray(np.random.default_rng(30).integers(
            0, cfg.codebook_size, (1, F, cfg.n_codebooks)), jnp.int32)
        audio = vocoder_decode(w, cfg, codes, trim="causal")
        assert audio.shape == (1, F * cfg.samples_per_frame)
        assert vocoder.vocoder_output_length(w, cfg, F, trim="causal") \
            == F * cfg.samples_per_frame


def test_causal_trim_is_shifted_both_trim(voc):
    """The causal trim keeps the same samples as the both-sides trim plus
    the right-edge tail: both-trim output == causal output with the extra
    left context removed at each decoder block, so the both-trim signal
    must appear inside the causal signal's interior."""
    cfg, w = voc
    F = 10
    codes = jnp.asarray(np.random.default_rng(31).integers(
        0, cfg.codebook_size, (1, F, cfg.n_codebooks)), jnp.int32)
    both = np.asarray(vocoder_decode(w, cfg, codes, trim="both"))[0]
    causal = np.asarray(vocoder_decode(w, cfg, codes, trim="causal"))[0]
    assert len(causal) > len(both)
    # both-trim removes extra samples from the right side only relative to
    # causal (the left trim is identical), so both == causal[:len(both)]
    # except where dilated residual convs see different left context —
    # which they don't, because the trims happen before the residual
    # stacks at each block; allow small numeric slack.
    np.testing.assert_allclose(both, causal[:len(both)], atol=1e-4)


def test_chunked_boundary_continuity(voc):
    """Chunked causal decode: interior of each chunk matches the full
    causal decode (bounded convT lookahead => only samples near chunk
    edges may differ), and chunk k occupies exactly
    [k*chunk*spf, (k+1)*chunk*spf)."""
    cfg, w = voc
    F, chunk = 16, 8
    spf = cfg.samples_per_frame
    codes = np.random.default_rng(32).integers(
        0, cfg.codebook_size, (F, cfg.n_codebooks))
    full = np.asarray(vocoder_decode(
        w, cfg, jnp.asarray(codes[None], jnp.int32), trim="causal"))[0]
    c0 = np.asarray(vocoder_decode(
        w, cfg, jnp.asarray(codes[None, :chunk], jnp.int32),
        trim="causal"))[0]
    assert len(full) == F * spf and len(c0) == chunk * spf
    # chunk 0's interior (3-frame lookahead margin) matches the full decode
    safe = (chunk - 3) * spf
    np.testing.assert_allclose(c0[:safe], full[:safe], atol=1e-4)


def test_batch_equals_single(voc):
    cfg, w = voc
    codes = np.random.default_rng(25).integers(
        0, cfg.codebook_size, (3, 6, cfg.n_codebooks))
    batch = np.asarray(vocoder_decode(w, cfg, jnp.asarray(codes, jnp.int32)))
    single = np.asarray(vocoder_decode(w, cfg, jnp.asarray(codes[:1], jnp.int32)))
    np.testing.assert_allclose(batch[0], single[0], atol=1e-4)


def test_subbatched_decode_matches(voc):
    """vocoder_decode_subbatched (one lax.map dispatch) must equal the
    plain per-batch decode — both trims, pcm16 both ways."""
    cfg, w = voc
    rng = np.random.default_rng(17)
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (8, 6, 16)),
                        jnp.int32)
    for trim in ("both", "causal"):
        base = vocoder.vocoder_decode(w, cfg, codes, trim=trim)
        sub = vocoder.vocoder_decode_subbatched(w, cfg, codes, trim=trim,
                                                sub=2)
        np.testing.assert_allclose(np.asarray(sub), np.asarray(base),
                                   atol=1e-5)
    p16 = vocoder.vocoder_decode_subbatched(w, cfg, codes, trim="causal",
                                            sub=4, pcm16=True)
    base16 = vocoder.vocoder_decode(w, cfg, codes, trim="causal",
                                    pcm16=True)
    assert p16.dtype == jnp.int16
    # +-1 LSB: the subbatched path runs the front at full batch width,
    # so XLA tiling may differ from the whole-batch decode in the f32
    # LSBs, which can flip an int16 rounding at the quantization edge
    diff = np.abs(np.asarray(p16, np.int32) - np.asarray(base16, np.int32))
    assert diff.max() <= 1, f"pcm16 differs by {diff.max()} LSB"
