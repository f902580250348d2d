"""Voice-cloning E2E: WAV -> speaker embedding -> conditioned synthesis,
plus the .embd cache flow through the CLI helper."""

import dataclasses

import numpy as np
import pytest

from qwen3_tts_tpu import cli
from qwen3_tts_tpu.models import speaker_encoder as spk
from qwen3_tts_tpu.models import vocoder as voc_mod
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.runtime import audio_io
from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams

from .test_tokenizer import make_tiny_tokenizer


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(100)
    talker_cfg = tiny_talker_config()        # hidden_size 64
    talker_w = init_talker_weights(rng, talker_cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    spk_cfg = dataclasses.replace(spk.tiny_speaker_encoder_config(),
                                  embedding_dim=talker_cfg.hidden_size)
    spk_w = spk.init_speaker_encoder_weights(rng, spk_cfg)
    return Qwen3TTS.from_components(make_tiny_tokenizer(), talker_cfg,
                                    talker_w, voc_cfg, voc_w, spk_cfg, spk_w)


def _ref_wav(tmp_path, seconds=0.3, sr=24000, name="ref.wav"):
    t = np.arange(int(seconds * sr)) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 881 * t)).astype(np.float32)
    path = str(tmp_path / name)
    audio_io.save_wav(path, x, sr)
    return path


def test_encode_speaker_from_wav(engine, tmp_path):
    path = _ref_wav(tmp_path)
    emb = engine.encode_speaker(path)
    assert emb is not None
    assert emb.shape == (engine.talker_cfg.hidden_size,)
    assert np.all(np.isfinite(emb))
    # deterministic
    emb2 = engine.encode_speaker(path)
    np.testing.assert_allclose(emb, emb2, atol=1e-5)


def test_encode_speaker_resamples(engine, tmp_path):
    # 16 kHz reference resampled to the encoder rate (qwen3_tts.cpp:329-334)
    t = np.arange(8000) / 16000
    x = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    path = str(tmp_path / "ref16k.wav")
    audio_io.save_wav(path, x, 16000)
    emb = engine.encode_speaker(path)
    assert emb is not None and np.all(np.isfinite(emb))


def test_encode_speaker_batch_matches_single(engine, tmp_path):
    """Bulk enrollment (device mel, one dispatch) == per-clip encoding
    (host numpy mel) for mixed-length clips."""
    sr = engine.spk_cfg.sample_rate
    rng = np.random.default_rng(43)
    clips = [rng.standard_normal(n).astype(np.float32) * 0.3
             for n in (7200, 4100, 9600)]
    batch = engine.encode_speaker_batch(clips, sr)
    assert batch is not None
    assert batch.shape == (3, engine.spk_cfg.embedding_dim)
    for i, c in enumerate(clips):
        single = engine.encode_speaker_samples(c, sr)
        np.testing.assert_allclose(batch[i], single, atol=1e-3, rtol=1e-3)
    # empty list is a valid no-op
    empty = engine.encode_speaker_batch([], sr)
    assert empty.shape == (0, engine.spk_cfg.embedding_dim)


def test_synthesize_with_voice(engine, tmp_path):
    path = _ref_wav(tmp_path)
    p = TTSParams(max_audio_tokens=10, temperature=0.0,
                  print_timing=False, seed=0)
    res = engine.synthesize_with_voice("hello world.", path, p)
    assert res.success, res.error_msg
    base = engine.synthesize("hello world.", p)
    # conditioning must change the output vs the default (zero) voice
    assert (res.n_frames != base.n_frames
            or not np.allclose(res.audio, base.audio))


def test_cli_resolve_embedding_cache(engine, tmp_path):
    path = _ref_wav(tmp_path)
    cache = path + ".embd"
    emb = cli.resolve_embedding(engine, cache, path)
    assert emb is not None
    # second resolve loads the cache (no encoder run needed)
    emb2 = cli.resolve_embedding(engine, cache, reference_audio=None)
    np.testing.assert_allclose(np.asarray(emb, np.float32),
                               np.asarray(emb2, np.float32), atol=1e-6)
