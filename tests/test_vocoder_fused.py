"""Parity tests for the fused residual-Snake-chain Pallas kernel
(ops/vocoder_fused.py) against the XLA reference chain
(models/vocoder.py::_residual_block)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models.vocoder import _residual_block
from qwen3_tts_tpu.ops.vocoder_fused import fused_residual_chain


def _mk_res(rng, c):
    return {
        "a1": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        "b1": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        "c1_w": jnp.asarray(rng.standard_normal((c, c, 7)) * 0.05,
                            jnp.bfloat16),
        "c1_b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        "a2": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        "b2": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        "c2_w": jnp.asarray(rng.standard_normal((c, c, 1)) * 0.05,
                            jnp.bfloat16),
        "c2_b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
    }


def _xla_chain(x, res_list):
    for rw, d in zip(res_list, (1, 3, 9)):
        x = _residual_block(rw, x, d)
    return x


@pytest.mark.parametrize("B,T,C", [(2, 512, 96), (1, 256, 128), (3, 384, 64)])
def test_fused_chain_matches_xla(B, T, C):
    rng = np.random.default_rng(0)
    res = [_mk_res(rng, C) for _ in range(3)]
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    want = np.asarray(_xla_chain(x, res))
    got = np.asarray(fused_residual_chain(x, res, interpret=True))
    # both paths do bf16 matmuls with f32 accumulation; residual adds f32
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    # tighter check on correlation (catches misaligned taps/halos)
    denom = float(np.sqrt((want ** 2).mean()))
    assert float(np.sqrt(((got - want) ** 2).mean())) / denom < 1e-2


def test_fused_chain_tile_boundaries():
    """Output must be identical whether T spans one tile or many —
    exercises the carried halo scratch across grid programs."""
    rng = np.random.default_rng(1)
    C = 64
    res = [_mk_res(rng, C) for _ in range(3)]
    x = jnp.asarray(rng.standard_normal((1, 1024, C)), jnp.float32)
    full = np.asarray(fused_residual_chain(x, res, interpret=True))
    want = np.asarray(_xla_chain(x, res))
    np.testing.assert_allclose(full, want, atol=5e-2, rtol=5e-2)


def test_fused_chain_rejects_bad_shapes():
    rng = np.random.default_rng(2)
    res = [_mk_res(rng, 96) for _ in range(3)]
    x = jnp.zeros((1, 300, 96), jnp.float32)   # 300 has no aligned divisor
    with pytest.raises(ValueError):
        fused_residual_chain(x, res, interpret=True)
    big = [_mk_res(rng, 1024) for _ in range(3)]
    with pytest.raises(ValueError):
        fused_residual_chain(jnp.zeros((1, 512, 1024)), big, interpret=True)
    with pytest.raises(ValueError):
        fused_residual_chain(jnp.zeros((1, 512, 96)), res[:2],
                             interpret=True)


class TestFusedSnakeConvT:
    def _mk(self, rng, c, c2, rate):
        return {
            "snake_a": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "snake_b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "conv_t_w": jnp.asarray(
                rng.standard_normal((c, c2, 2 * rate)) * 0.05, jnp.bfloat16),
            "conv_t_b": jnp.asarray(rng.standard_normal(c2) * 0.1,
                                    jnp.float32),
        }

    def _xla_head(self, w, x, rate):
        from qwen3_tts_tpu.models.vocoder import (conv_transpose1d, snake)
        k = w["conv_t_w"].shape[-1]
        y = snake(x, w["snake_a"], w["snake_b"])
        y = conv_transpose1d(y, w["conv_t_w"], rate)
        cut = k - rate
        T = x.shape[1]
        return y[:, cut:cut + T * rate] + w["conv_t_b"]

    @pytest.mark.parametrize("B,T,C,C2,rate",
                             [(2, 64, 32, 16, 3), (1, 128, 16, 8, 4),
                              (2, 40, 24, 12, 5), (1, 32, 16, 8, 8)])
    def test_matches_xla_head(self, B, T, C, C2, rate):
        from qwen3_tts_tpu.ops.vocoder_fused import fused_snake_convt
        rng = np.random.default_rng(0)
        w = self._mk(rng, C, C2, rate)
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        want = np.asarray(self._xla_head(w, x, rate))
        got = np.asarray(fused_snake_convt(
            x, w["snake_a"], w["snake_b"], w["conv_t_w"], w["conv_t_b"],
            rate, interpret=True))
        assert got.shape == (B, T * rate, C2)
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
        denom = float(np.sqrt((want ** 2).mean()))
        assert float(np.sqrt(((got - want) ** 2).mean())) / denom < 1e-2

    def test_tile_boundary_future_row(self):
        """The future-row halo must carry across tile boundaries (grid is
        walked in reverse): T spanning many tiles must equal one tile."""
        from qwen3_tts_tpu.ops.vocoder_fused import fused_snake_convt
        rng = np.random.default_rng(1)
        w = self._mk(rng, 64, 32, 2)
        x = jnp.asarray(rng.standard_normal((1, 512, 64)), jnp.float32)
        want = np.asarray(self._xla_head(w, x, 2))
        got = np.asarray(fused_snake_convt(
            x, w["snake_a"], w["snake_b"], w["conv_t_w"], w["conv_t_b"],
            2, interpret=True))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    def test_rejects_bad_shapes(self):
        from qwen3_tts_tpu.ops.vocoder_fused import fused_snake_convt
        rng = np.random.default_rng(2)
        w = self._mk(rng, 16, 8, 3)
        x = jnp.zeros((1, 64, 16), jnp.float32)
        with pytest.raises(ValueError):   # K != 2*rate
            fused_snake_convt(x, w["snake_a"], w["snake_b"],
                              w["conv_t_w"][:, :, :5], w["conv_t_b"], 3,
                              interpret=True)


def test_res_chain_impl_traced_observation(rng):
    """res_chain_impl_traced() reports what the trace actually used —
    benchmarks label their JSON with it instead of inferring from the
    backend (the silent shape-fallback made inference wrong)."""
    from qwen3_tts_tpu.models import vocoder as vm

    C, T, B = 32, 64, 2
    res = []
    for _ in range(3):
        res.append({
            "a1": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
            "b1": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
            "c1_w": jnp.asarray(rng.standard_normal((C, C, 7)) * 0.05,
                                jnp.bfloat16),
            "c1_b": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
            "a2": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
            "b2": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
            "c2_w": jnp.asarray(rng.standard_normal((C, C, 1)) * 0.05,
                                jnp.bfloat16),
            "c2_b": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32),
        })
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

    vm.reset_res_chain_traced()
    assert vm.res_chain_impl_traced() == "untraced"
    vm._res_chain(res, x)            # auto on CPU -> XLA chain
    assert vm.res_chain_impl_traced() == "xla"

    vm.reset_res_chain_traced()
    vm.set_res_chain_impl("fused_interpret")
    try:
        vm._res_chain(res, x)
        assert vm.res_chain_impl_traced() == "fused"
    finally:
        vm.set_res_chain_impl("auto")
