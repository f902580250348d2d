"""Native C++ library tests: dequant parity with numpy, resampler parity."""

import numpy as np
import pytest

from qwen3_tts_tpu import native
from qwen3_tts_tpu.io import gguf
from qwen3_tts_tpu.runtime import audio_io

lib = native.load_library()
pytestmark = pytest.mark.skipif(lib is None, reason="native lib not built")


def test_dequant_f16_parity(rng):
    x = rng.standard_normal(1024).astype(np.float16)
    raw = np.frombuffer(x.tobytes(), np.uint8)
    want = gguf.dequantize(raw, gguf.GGML_F16, 1024)
    got = native.dequantize_f32(raw, gguf.GGML_F16, 1024)
    np.testing.assert_array_equal(got, want)


def test_dequant_q8_0_parity(rng):
    x = rng.standard_normal(4096).astype(np.float32) * 3
    raw = np.frombuffer(gguf.quantize_q8_0(x).tobytes(), np.uint8)
    want = gguf.dequantize(raw, gguf.GGML_Q8_0, 4096)
    got = native.dequantize_f32(raw, gguf.GGML_Q8_0, 4096)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dequant_q4_0_parity(rng):
    raw = rng.integers(0, 256, 18 * 64, dtype=np.uint8)
    # make scales sane f16 values
    for b in range(64):
        raw[b * 18:b * 18 + 2] = np.frombuffer(
            np.float16(rng.uniform(0.01, 1.0)).tobytes(), np.uint8)
    want = gguf.dequantize(raw, gguf.GGML_Q4_0, 32 * 64)
    got = native.dequantize_f32(raw, gguf.GGML_Q4_0, 32 * 64)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dequant_q4_k_parity(rng):
    n_blocks = 16
    raw = rng.integers(0, 256, 144 * n_blocks, dtype=np.uint8)
    for b in range(n_blocks):
        raw[b * 144:b * 144 + 2] = np.frombuffer(
            np.float16(rng.uniform(0.01, 1.0)).tobytes(), np.uint8)
        raw[b * 144 + 2:b * 144 + 4] = np.frombuffer(
            np.float16(rng.uniform(0.0, 0.5)).tobytes(), np.uint8)
    want = gguf.dequantize(raw, gguf.GGML_Q4_K, 256 * n_blocks)
    got = native.dequantize_f32(raw, gguf.GGML_Q4_K, 256 * n_blocks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dequant_bf16_parity(rng):
    x = rng.standard_normal(512).astype(np.float32)
    bf = ((x.view(np.uint32) >> 16).astype(np.uint16))
    raw = np.frombuffer(bf.tobytes(), np.uint8)
    want = gguf.dequantize(raw, gguf.GGML_BF16, 512)
    got = native.dequantize_f32(raw, gguf.GGML_BF16, 512)
    np.testing.assert_array_equal(got, want)


def test_resample_parity(rng):
    x = rng.standard_normal(24000).astype(np.float32)
    want = audio_io.resample_linear(x, 16000, 24000)
    got = native.resample_linear(x, 16000, 24000)
    assert got is not None
    np.testing.assert_allclose(got[:len(want)], want, atol=1e-6)
    assert abs(len(got) - len(want)) <= 1


def test_dequant_to_bf16_output(rng):
    """q3t_dequant_bf16: f32 values round-to-nearest-even into bf16 bit
    patterns, and NaN stays NaN (the unguarded rounding used to carry a
    small-payload NaN's mantissa into the exponent, emitting +/-Inf)."""
    x = rng.standard_normal(256).astype(np.float32)
    x[3] = np.nan
    x[7] = np.inf
    raw = np.frombuffer(x.astype(np.float16).tobytes(), np.uint8)
    got = native.dequantize_bf16(raw, gguf.GGML_F16, 256)
    if got is None:
        pytest.skip("native library unavailable")
    back = got.astype(np.uint32) << 16
    vals = back.view(np.float32) if back.dtype == np.float32 else \
        np.frombuffer(back.astype(np.uint32).tobytes(), np.float32)
    assert np.isnan(vals[3])
    assert np.isinf(vals[7]) and vals[7] > 0
    ref = x.astype(np.float16).astype(np.float32)
    ok = np.isfinite(ref)
    assert np.abs(vals[ok] - ref[ok]).max() <= np.abs(ref[ok]).max() / 128
