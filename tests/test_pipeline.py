"""End-to-end pipeline tests on tiny random models: text -> tokens ->
prefill -> chunked generation -> vocoder -> waveform."""

import dataclasses

import numpy as np
import pytest

from qwen3_tts_tpu.models import vocoder as voc_mod
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
from qwen3_tts_tpu.runtime import audio_io

from .test_tokenizer import make_tiny_tokenizer


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(50)
    talker_cfg = tiny_talker_config()
    talker_w = init_talker_weights(rng, talker_cfg)
    # vocoder codebooks must cover CB0 values (< 2048) and code-pred vocab
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    return Qwen3TTS.from_components(make_tiny_tokenizer(), talker_cfg,
                                    talker_w, voc_cfg, voc_w)


def _params(**kw):
    defaults = dict(max_audio_tokens=24, temperature=0.0, top_k=50,
                    print_timing=False, seed=0)
    defaults.update(kw)
    return TTSParams(**defaults)


def test_e2e_synthesize(engine):
    res = engine.synthesize("hello world.", _params())
    assert res.success, res.error_msg
    assert res.n_frames >= 1
    assert res.audio.dtype == np.float32
    assert len(res.audio) > 0
    assert np.all(np.abs(res.audio) <= 1.0)


def test_e2e_deterministic_greedy(engine):
    a = engine.synthesize("hello world.", _params())
    b = engine.synthesize("hello world.", _params(seed=99))
    # greedy: seed must not matter
    np.testing.assert_array_equal(a.audio, b.audio)


def test_e2e_sampled_seeded(engine):
    a = engine.synthesize("hello world.", _params(temperature=0.9, seed=7))
    b = engine.synthesize("hello world.", _params(temperature=0.9, seed=7))
    np.testing.assert_array_equal(a.audio, b.audio)


def test_e2e_batch_matches_single(engine):
    """Greedy batched synthesis must reproduce single-stream output."""
    p = _params()
    single = engine.synthesize("hello world.", p)
    batch = engine.synthesize_batch(["hello world.", "hello hello."],
                                    None, p)
    assert batch[0].success and batch[1].success
    assert batch[0].n_frames == single.n_frames
    np.testing.assert_allclose(batch[0].audio, single.audio, atol=1e-3)


def test_e2e_with_embedding(engine):
    cfg = engine.talker_cfg
    emb = np.random.default_rng(51).standard_normal(
        cfg.hidden_size).astype(np.float32) * 0.1
    res = engine.synthesize_with_embedding("hello world.", emb, _params())
    assert res.success
    base = engine.synthesize("hello world.", _params())
    # a different speaker embedding must change the prefill -> audio
    assert (len(res.audio) != len(base.audio)
            or not np.allclose(res.audio, base.audio))


def test_e2e_streaming_matches_nonstreaming_frames(engine):
    """Streaming (chunked) and full decode must agree on the generated
    code frames; waveforms differ only through chunk-boundary context."""
    a = engine.synthesize("hello world.", _params(streaming_vocoder=True))
    b = engine.synthesize("hello world.", _params(streaming_vocoder=False))
    assert a.n_frames == b.n_frames
    assert a.success and b.success


def test_streaming_audio_length_parity(engine):
    """The streaming (TRT-analogue) path emits exactly n_frames *
    samples_per_frame samples — the reference binary's length arithmetic
    (trt_vocoder.cpp:151-166)."""
    res = engine.synthesize("hello world.", _params(streaming_vocoder=True))
    assert res.success
    spf = engine.voc_cfg.samples_per_frame
    assert len(res.audio) == res.n_frames * spf


def test_decode_codes_chunked_length_parity(engine):
    cfg = engine.voc_cfg
    frames = np.random.default_rng(40).integers(
        0, cfg.codebook_size, (13, cfg.n_codebooks)).astype(np.int32)
    audio = engine.decode_codes_chunked(frames, chunk=5)
    assert len(audio) == 13 * cfg.samples_per_frame


def test_max_tokens_respected(engine):
    res = engine.synthesize("hello world.", _params(max_audio_tokens=5))
    assert res.n_frames <= 5


def test_empty_text_still_synthesizes(engine):
    # encode_for_tts always yields the 9 template tokens, so even "" passes
    # the reference's n_tokens >= 4 gate (tts_transformer.cpp:2360)
    res = engine.synthesize_batch([""], None, _params())[0]
    assert res.success


def test_wav_roundtrip(tmp_path):
    sr = 24000
    x = (np.sin(np.arange(2400) * 0.05) * 0.5).astype(np.float32)
    path = str(tmp_path / "t.wav")
    audio_io.save_wav(path, x, sr)
    y, sr2 = audio_io.load_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_resample_linear():
    x = np.arange(10, dtype=np.float32)
    y = audio_io.resample_linear(x, 10, 20)
    assert len(y) == 20
    np.testing.assert_allclose(y[:4], [0.0, 0.5, 1.0, 1.5], atol=1e-5)
    # identity when rates match
    np.testing.assert_array_equal(audio_io.resample_linear(x, 10, 10), x)


def test_embedding_cache_roundtrip(tmp_path):
    e = np.random.default_rng(52).standard_normal(1024).astype(np.float32)
    path = str(tmp_path / "v.embd")
    assert audio_io.save_embedding(path, e)
    got = audio_io.load_embedding(path)
    np.testing.assert_array_equal(got, e)
    assert audio_io.load_embedding(str(tmp_path / "missing.embd")) is None


def test_max_tokens_respected_multichunk(engine):
    """The cap bounds TOTAL frames across chunks — the old check compared
    the per-chunk list LENGTH against the cap, so any request spanning
    more than one 40-frame chunk overshot (e.g. 80 frames at cap 50)."""
    long_text = "hello world. " * 20  # n_text ~ hundreds -> EOS ramp >> 50
    res = engine.synthesize(long_text, _params(max_audio_tokens=50))
    assert res.success
    assert res.n_frames <= 50
