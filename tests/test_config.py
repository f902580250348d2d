"""Config parsing tests: GGUF metadata fallback chains and defaults
(tts_transformer.cpp:288-441 semantics)."""

from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig
from qwen3_tts_tpu.io.gguf import GGUFReader, GGUFWriter


def _roundtrip(tmp_path, kv: dict, arch="qwen3-tts"):
    w = GGUFWriter(arch)
    for k, v in kv.items():
        if isinstance(v, float):
            w.add_f32_scalar(k, v)
        else:
            w.add(k, v)
    path = str(tmp_path / "cfg.gguf")
    w.write(path)
    return GGUFReader(path)


def test_defaults_without_metadata(tmp_path):
    with _roundtrip(tmp_path, {}) as r:
        cfg = TalkerConfig.from_gguf(r)
    d = TalkerConfig()
    assert cfg == d
    assert cfg.hidden_size == 1024
    assert cfg.n_layers == 28
    assert cfg.codec_eos_id == 2150
    assert cfg.rope_theta == 1e6


def test_primary_key_preferred_over_fallback(tmp_path):
    with _roundtrip(tmp_path, {
        "qwen3-tts.talker.embedding_length": 512,
        "qwen3-tts.embedding_length": 2048,
    }) as r:
        cfg = TalkerConfig.from_gguf(r)
    assert cfg.hidden_size == 512


def test_fallback_key_used(tmp_path):
    with _roundtrip(tmp_path, {
        "qwen3-tts.embedding_length": 768,
        "qwen3-tts.block_count": 12,
        "qwen3-tts.codec.eos_token_id": 999,
    }) as r:
        cfg = TalkerConfig.from_gguf(r)
    assert cfg.hidden_size == 768
    assert cfg.n_layers == 12
    assert cfg.codec_eos_id == 999


def test_code_pred_inherits_talker_dims(tmp_path):
    """1.7B-style configs override code-pred dims; 0.6B inherits
    (tts_transformer.cpp:369-385)."""
    with _roundtrip(tmp_path, {"qwen3-tts.embedding_length": 768}) as r:
        cfg = TalkerConfig.from_gguf(r)
    assert cfg.code_pred_hidden_size == 768
    with _roundtrip(tmp_path, {
        "qwen3-tts.embedding_length": 768,
        "qwen3-tts.code_predictor.embedding_length": 512,
    }) as r:
        cfg = TalkerConfig.from_gguf(r)
    assert cfg.code_pred_hidden_size == 512
    assert cfg.hidden_size == 768


def test_vocoder_config_parse(tmp_path):
    with _roundtrip(tmp_path, {
        "qwen3-tts-tokenizer.sample_rate": 16000,
        "qwen3-tts-tokenizer.num_codebooks": 8,
        "qwen3-tts-tokenizer.upsample_rates": [4, 4, 2, 2],
    }, arch="qwen3-tts-tokenizer") as r:
        cfg = VocoderConfig.from_gguf(r)
    assert cfg.sample_rate == 16000
    assert cfg.n_codebooks == 8
    assert cfg.upsample_rates == (4, 4, 2, 2)
    assert cfg.samples_per_frame == 4 * 64


def test_vocoder_defaults():
    cfg = VocoderConfig()
    assert cfg.samples_per_frame == 1920  # 4 * 8*5*4*3 (trt_vocoder.h:50)
