"""Unit tests for core ops: RMSNorm and NEOX RoPE against manual formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.ops.layers import rms_norm, rope_neox


def test_rms_norm_formula(rng):
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    w = rng.standard_normal(8).astype(np.float32)
    eps = 1e-6
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps))
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * w
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_neox_pairs(rng):
    """NEOX pairing: dims (i, i+D/2) rotate together with freq
    theta^(-2i/D) (ggml_rope_ext GGML_ROPE_TYPE_NEOX semantics)."""
    B, T, H, D = 1, 3, 2, 8
    theta = 10000.0
    x = rng.standard_normal((B, T, H, D)).astype(np.float32)
    pos = np.arange(T, dtype=np.int32)[None, :]
    got = np.asarray(rope_neox(jnp.asarray(x), jnp.asarray(pos), theta))

    want = np.empty_like(x)
    half = D // 2
    for t in range(T):
        for i in range(half):
            freq = theta ** (-2.0 * i / D)
            ang = t * freq
            c, s = np.cos(ang), np.sin(ang)
            x1 = x[0, t, :, i]
            x2 = x[0, t, :, i + half]
            want[0, t, :, i] = x1 * c - x2 * s
            want[0, t, :, i + half] = x1 * s + x2 * c
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_position_zero_is_identity(rng):
    x = rng.standard_normal((1, 1, 4, 16)).astype(np.float32)
    pos = np.zeros((1, 1), np.int32)
    got = np.asarray(rope_neox(jnp.asarray(x), jnp.asarray(pos), 1e6))
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_rope_per_stream_positions(rng):
    """Different positions per batch row (continuous batching) rotate
    independently."""
    x = rng.standard_normal((2, 1, 2, 8)).astype(np.float32)
    x = np.concatenate([x[:1], x[:1]], axis=0)  # identical rows
    pos = np.asarray([[3], [7]], np.int32)
    got = np.asarray(rope_neox(jnp.asarray(x), jnp.asarray(pos), 1e4))
    # row 1 with pos 7 equals an independent call at pos 7
    alone = np.asarray(rope_neox(jnp.asarray(x[1:]),
                                 jnp.asarray(pos[1:]), 1e4))
    np.testing.assert_allclose(got[1:], alone, atol=1e-6)
    assert not np.allclose(got[0], got[1])


class TestFastSin2:
    def test_matches_exact_sin2(self):
        from qwen3_tts_tpu.ops.layers import fast_sin2
        z = jnp.asarray(np.linspace(-300.0, 300.0, 200001), jnp.float32)
        got = np.asarray(fast_sin2(z))
        want = np.sin(np.asarray(z, np.float64)) ** 2
        assert np.max(np.abs(got - want)) < 2e-6

    def test_snake_fast_vs_exact(self):
        from qwen3_tts_tpu.models.vocoder import snake, set_snake_sin2_impl
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 64, 8)) * 20, jnp.float32)
        a = jnp.asarray(rng.standard_normal(8) * 0.3, jnp.float32)
        b = jnp.asarray(rng.standard_normal(8) * 0.3, jnp.float32)
        try:
            set_snake_sin2_impl("exact")
            want = np.asarray(snake(x, a, b))
            set_snake_sin2_impl("fast")
            got = np.asarray(snake(x, a, b))
        finally:
            set_snake_sin2_impl("fast")
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_bad_impl_rejected(self):
        from qwen3_tts_tpu.models.vocoder import set_snake_sin2_impl
        with pytest.raises(ValueError):
            set_snake_sin2_impl("nope")
