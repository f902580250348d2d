"""GGUF reader/writer round-trip + dequantization tests."""

import numpy as np
import pytest

from qwen3_tts_tpu.io.gguf import (
    GGML_F16, GGML_F32, GGML_Q8_0, GGUFReader, GGUFWriter,
    dequantize, quantize_q8_0,
)


def test_roundtrip_metadata_and_tensors(tmp_path, rng):
    w = GGUFWriter("qwen3-tts")
    w.add("qwen3-tts.block_count", 28)
    w.add("qwen3-tts.rope.freq_base", 1e6)
    w.add("qwen3-tts.rope.mrope_section", [24, 20, 20])
    w.add("tokenizer.ggml.tokens", ["a", "b", "Ġhello"])
    w.add("general.name", "test-model")
    w.add("some.bool", True)

    a = rng.standard_normal((8, 16)).astype(np.float32)
    b = rng.standard_normal((4, 32)).astype(np.float32)
    w.add_tensor("talker.blk.0.attn_q.weight", a, GGML_F32)
    w.add_tensor("talker.blk.0.attn_k.weight", b, GGML_F16)

    path = str(tmp_path / "test.gguf")
    w.write(path)

    with GGUFReader(path) as r:
        assert r.get("qwen3-tts.block_count") == 28
        assert r.get("qwen3-tts.rope.freq_base") == pytest.approx(1e6)
        assert r.get("qwen3-tts.rope.mrope_section") == [24, 20, 20]
        assert r.get("tokenizer.ggml.tokens") == ["a", "b", "Ġhello"]
        assert r.get("general.name") == "test-model"
        assert r.get("some.bool") is True

        ra = r.tensor_data("talker.blk.0.attn_q.weight")
        assert ra.shape == (8, 16)
        np.testing.assert_array_equal(ra, a)

        rb = r.tensor_data("talker.blk.0.attn_k.weight")
        assert rb.shape == (4, 32)
        np.testing.assert_allclose(rb, a.astype(np.float16).astype(np.float32)[:0].sum() +
                                   b.astype(np.float16).astype(np.float32), rtol=0)


def test_get_any_fallback_chain(tmp_path):
    w = GGUFWriter("qwen3-tts")
    w.add("qwen3-tts.embedding_length", 1024)
    path = str(tmp_path / "m.gguf")
    w.write(path)
    with GGUFReader(path) as r:
        v = r.get_any(["qwen3-tts.talker.embedding_length",
                       "qwen3-tts.embedding_length"], 0)
        assert v == 1024
        assert r.get_any(["missing.key"], 42) == 42


def test_q8_0_roundtrip(rng):
    x = rng.standard_normal(256).astype(np.float32) * 3.0
    raw = quantize_q8_0(x)
    y = dequantize(raw, GGML_Q8_0, 256)
    # Q8_0 is ~7-bit relative precision per 32-block
    np.testing.assert_allclose(y, x, atol=np.abs(x).max() / 100.0)


def test_q4_0_quantize_roundtrip(rng):
    from qwen3_tts_tpu.io.gguf import GGML_Q4_0, quantize_q4_0
    x = rng.standard_normal(512).astype(np.float32) * 2.0
    raw = quantize_q4_0(x)
    y = dequantize(raw, GGML_Q4_0, 512)
    # 4-bit: per-32-block error bounded by ~d = max/8
    err = np.abs(y - x).reshape(-1, 32).max(axis=1)
    bound = np.abs(x).reshape(-1, 32).max(axis=1) / 8.0 + 1e-6
    assert np.all(err <= bound * 1.01)


def test_q4_k_quantize_roundtrip(rng):
    from qwen3_tts_tpu.io.gguf import GGML_Q4_K, quantize_q4_k
    x = (rng.standard_normal(1024).astype(np.float32) * 2.0 + 0.7)
    raw = quantize_q4_k(x)
    assert raw.size == (1024 // 256) * 144
    y = dequantize(raw, GGML_Q4_K, 1024)
    # 4-bit with per-sub-block min/scale: step = (max-min)/15 (+6-bit
    # scale quantization slack)
    sub_x = x.reshape(-1, 32)
    step = (sub_x.max(axis=1) - sub_x.min(axis=1)) / 15.0
    err = np.abs(y - x).reshape(-1, 32).max(axis=1)
    assert np.all(err <= step * 1.2 + 0.05)


def test_q4_writer_roundtrip(tmp_path, rng):
    from qwen3_tts_tpu.io.gguf import GGML_Q4_0, GGML_Q4_K, GGUFWriter
    w = GGUFWriter("test")
    a = rng.standard_normal((16, 32)).astype(np.float32)
    b = rng.standard_normal((8, 64)).astype(np.float32)
    w.add_tensor("a", a, GGML_Q4_0)
    w.add_tensor("b", b, GGML_Q4_K)
    path = tmp_path / "q4.gguf"
    w.write(str(path))
    with GGUFReader(str(path)) as r:
        assert r.tensors["a"].ggml_type == GGML_Q4_0
        assert r.tensors["b"].ggml_type == GGML_Q4_K
        np.testing.assert_allclose(r.tensor_data("a"), a,
                                   atol=np.abs(a).max() / 7.5)
        np.testing.assert_allclose(r.tensor_data("b"), b,
                                   atol=np.abs(b).max() / 7.0)


def test_q4_0_dequant_known_block():
    # Hand-built single Q4_0 block: d=0.5, quants 0..15 twice
    import struct
    d = np.float16(0.5).tobytes()
    qs = bytes((i | (i << 4)) for i in range(16))  # lo nibble=i, hi nibble=i
    raw = d + qs
    y = dequantize(np.frombuffer(raw, dtype=np.uint8), 2, 32)  # GGML_Q4_0
    expected = np.concatenate([np.arange(16), np.arange(16)]).astype(np.float32)
    expected = (expected - 8.0) * 0.5
    np.testing.assert_allclose(y, expected)


def test_q4_k_dequant_roundtrip_structure():
    # Build one Q4_K superblock with unit scales and check the value formula
    raw = np.zeros(144, dtype=np.uint8)
    raw[0:2] = np.frombuffer(np.float16(1.0).tobytes(), dtype=np.uint8)  # d
    raw[2:4] = np.frombuffer(np.float16(0.0).tobytes(), dtype=np.uint8)  # dmin
    # scales: set 6-bit scale of sub-block 0 to 2, others to 1
    scales = np.zeros(12, dtype=np.uint8)
    scales[0] = 2
    for j in range(1, 4):
        scales[j] = 1
    for j in range(4, 8):
        scales[j + 4] = (scales[j + 4] & 0xF0) | 1  # low nibble -> sc
    raw[4:16] = scales
    # quants: all nibbles = 3
    raw[16:144] = 0x33
    y = dequantize(raw, 12, 256)  # GGML_Q4_K
    assert y.shape == (256,)
    np.testing.assert_allclose(y[:32], 2 * 3.0)   # sub-block 0: d*sc*q = 1*2*3
    np.testing.assert_allclose(y[32:64], 1 * 3.0)
    np.testing.assert_allclose(y[128:], 3.0)      # sub-blocks 4..7 sc=1


def test_reader_supports_v2(tmp_path, rng):
    """GGUF v2 files differ only in the version field for the subset we
    parse; the reader accepts both (gguf_loader.cpp consumes either)."""
    import struct
    w = GGUFWriter("qwen3-tts")
    w.add("qwen3-tts.block_count", 4)
    a = rng.standard_normal((4, 8)).astype(np.float32)
    w.add_tensor("t", a, GGML_F32)
    path = str(tmp_path / "v2.gguf")
    w.write(path)
    with open(path, "r+b") as f:
        f.seek(4)
        f.write(struct.pack("<I", 2))  # patch version to 2
    with GGUFReader(path) as r:
        assert r.version == 2
        assert r.get("qwen3-tts.block_count") == 4
        np.testing.assert_array_equal(r.tensor_data("t"), a)


def test_reader_rejects_bad_magic(tmp_path):
    path = str(tmp_path / "bad.gguf")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFReader(path)


def test_writer_integer_tensors_roundtrip_as_i32(tmp_path, rng):
    """Integer inputs (incl. numpy's default int64) write as I32 — the
    old dtype inference silently cast them to F32, corrupting values
    above 2^24; out-of-range int64 raises instead."""
    from qwen3_tts_tpu.io.gguf import GGUFReader, GGUFWriter
    w = GGUFWriter("t")
    ids = np.arange(100) + 2**25          # > f32's exact-int range
    w.add_tensor("ids", ids)
    path = tmp_path / "ints.gguf"
    w.write(str(path))
    with GGUFReader(str(path)) as r:
        arr = r.tensor_data("ids")
    assert arr.dtype == np.int32
    np.testing.assert_array_equal(arr.reshape(-1), ids)

    w2 = GGUFWriter("t")
    with pytest.raises(ValueError, match="int32 range"):
        w2.add_tensor("big", np.array([2**40]))
