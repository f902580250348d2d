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
