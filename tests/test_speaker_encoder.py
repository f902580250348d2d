"""Speaker encoder tests: mel frontend parity with the reference formulas,
bucketed-length invariance of the ECAPA graph."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.config import SpeakerEncoderConfig
from qwen3_tts_tpu.models import speaker_encoder as se


def naive_reference_mel(samples, cfg):
    """Direct transcription of the reference's math
    (compute_mel_spectrogram, audio_tokenizer_encoder.cpp:281-364),
    including the naive DFT — used only on tiny inputs as ground truth."""
    n = len(samples)
    pad = (cfg.n_fft - cfg.hop_length) // 2
    padded = np.empty(n + 2 * pad, np.float32)
    for i in range(len(padded)):
        if i < pad:
            src = pad - i
        elif i >= pad + n:
            src = 2 * n - (i - pad) - 2
        else:
            src = i - pad
        padded[i] = samples[np.clip(src, 0, n - 1)]
    n_frames = (len(padded) - cfg.n_fft) // cfg.hop_length + 1
    window = np.zeros(cfg.n_fft)
    off = (cfg.n_fft - cfg.win_length) // 2
    for i in range(cfg.win_length):
        window[off + i] = 0.5 * (1 - np.cos(2 * np.pi * i / cfg.win_length))
    n_bins = cfg.n_fft // 2 + 1
    fb = se.mel_filterbank_slaney(cfg.n_mels, cfg.n_fft, cfg.sample_rate,
                                  cfg.f_min, cfg.f_max)
    mel = np.zeros((n_frames, cfg.n_mels), np.float32)
    for f in range(n_frames):
        frame = padded[f * cfg.hop_length:f * cfg.hop_length + cfg.n_fft] * window
        re = np.zeros(n_bins)
        im = np.zeros(n_bins)
        for k in range(n_bins):
            ang = -2 * np.pi * k * np.arange(cfg.n_fft) / cfg.n_fft
            re[k] = np.sum(frame * np.cos(ang))
            im[k] = np.sum(frame * np.sin(ang))
        mag = np.sqrt(re ** 2 + im ** 2 + 1e-9)
        mel[f] = np.log(np.maximum(fb @ mag, 1e-5))
    return mel


def test_mel_matches_naive_dft():
    cfg = SpeakerEncoderConfig(n_mels=8, n_fft=64, hop_length=16,
                               win_length=64, sample_rate=24000,
                               f_min=0.0, f_max=12000.0)
    rng = np.random.default_rng(31)
    samples = rng.standard_normal(300).astype(np.float32)
    fast = se.mel_spectrogram(samples, cfg)
    slow = naive_reference_mel(samples, cfg)
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, atol=1e-3)


def test_mel_centered_window():
    # win_length < n_fft: window centered in the frame
    cfg = SpeakerEncoderConfig(n_mels=4, n_fft=64, hop_length=16,
                               win_length=32, f_max=12000.0)
    samples = np.sin(np.arange(400) * 0.1).astype(np.float32)
    mel = se.mel_spectrogram(samples, cfg)
    assert mel.shape[1] == 4
    assert np.all(np.isfinite(mel))


@pytest.fixture(scope="module")
def enc():
    cfg = se.tiny_speaker_encoder_config()
    w = se.init_speaker_encoder_weights(np.random.default_rng(33), cfg)
    return cfg, w


def test_embedding_shape(enc):
    cfg, w = enc
    B, T = 2, 32
    mel = jnp.asarray(np.random.default_rng(34).standard_normal((B, T, cfg.n_mels)),
                      jnp.float32)
    emb = se.encode(w, cfg, mel, jnp.array([T, T], jnp.int32))
    assert emb.shape == (B, cfg.embedding_dim)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_bucket_padding_invariance(enc):
    """Embedding must not change when the mel buffer is padded to a larger
    bucket — the property that lets one compiled graph serve all lengths
    (the reference recompiles per exact length instead)."""
    cfg, w = enc
    T = 20
    rng = np.random.default_rng(35)
    mel = rng.standard_normal((1, T, cfg.n_mels)).astype(np.float32)
    n_valid = jnp.array([T], jnp.int32)

    e_exact = se.encode(w, cfg, jnp.asarray(mel), n_valid)
    padded = np.zeros((1, 48, cfg.n_mels), np.float32)
    padded[:, :T] = mel
    e_padded = se.encode(w, cfg, jnp.asarray(padded), n_valid)
    np.testing.assert_allclose(np.asarray(e_exact), np.asarray(e_padded),
                               atol=1e-4, rtol=1e-4)


def test_batch_independent_lengths(enc):
    cfg, w = enc
    rng = np.random.default_rng(36)
    m1 = rng.standard_normal((1, 24, cfg.n_mels)).astype(np.float32)
    m2 = rng.standard_normal((1, 40, cfg.n_mels)).astype(np.float32)
    batch = np.zeros((2, 40, cfg.n_mels), np.float32)
    batch[0, :24] = m1[0]
    batch[1] = m2[0]
    eb = se.encode(w, cfg, jnp.asarray(batch), jnp.array([24, 40], jnp.int32))
    e1 = se.encode(w, cfg, jnp.asarray(m1), jnp.array([24], jnp.int32))
    e2 = se.encode(w, cfg, jnp.asarray(m2), jnp.array([40], jnp.int32))
    np.testing.assert_allclose(np.asarray(eb[0]), np.asarray(e1[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(eb[1]), np.asarray(e2[0]), atol=1e-4)


def test_mel_batch_matches_numpy():
    """Device mel (mel_spectrogram_batch) vs the host numpy mel, with
    mixed-length clips zero-padded to one sample bucket."""
    cfg = SpeakerEncoderConfig(n_mels=8, n_fft=64, hop_length=16,
                               win_length=64, sample_rate=24000,
                               f_min=0.0, f_max=12000.0)
    rng = np.random.default_rng(41)
    lens = [300, 190, 512]
    clips = [rng.standard_normal(n).astype(np.float32) for n in lens]
    N = max(lens)
    batch = np.zeros((len(clips), N), np.float32)
    for i, c in enumerate(clips):
        batch[i, :len(c)] = c
    mel, n_frames = se.mel_spectrogram_batch(
        jnp.asarray(batch), jnp.asarray(lens, dtype=jnp.int32), cfg)
    mel = np.asarray(mel)
    n_frames = np.asarray(n_frames)
    for i, c in enumerate(clips):
        want = se.mel_spectrogram(c, cfg)
        assert n_frames[i] == want.shape[0]
        assert n_frames[i] == se.mel_frames_for_samples(lens[i], cfg)
        np.testing.assert_allclose(mel[i, :n_frames[i]], want,
                                   atol=1e-4, rtol=1e-4)
        # rows past the valid frame count are zeroed
        assert np.all(mel[i, n_frames[i]:] == 0.0)


def test_mel_batch_end_to_end_encode(enc):
    """Device-mel -> encode equals numpy-mel -> encode per clip (the
    bulk-enrollment path, pipeline.encode_speaker_batch)."""
    cfg, w = enc
    mcfg = SpeakerEncoderConfig(n_mels=cfg.n_mels, n_fft=64, hop_length=16,
                                win_length=64, sample_rate=24000,
                                f_min=0.0, f_max=12000.0,
                                embedding_dim=cfg.embedding_dim,
                                hidden_dim=cfg.hidden_dim,
                                res2net_scale=cfg.res2net_scale)
    rng = np.random.default_rng(42)
    lens = [400, 256]
    clips = [rng.standard_normal(n).astype(np.float32) for n in lens]
    N = se.bucket_samples(max(lens), mcfg, bucket_s=512 / 24000)
    batch = np.zeros((len(clips), N), np.float32)
    for i, c in enumerate(clips):
        batch[i, :len(c)] = c
    mel, n_frames = se.mel_spectrogram_batch(
        jnp.asarray(batch), jnp.asarray(lens, dtype=jnp.int32), mcfg)
    eb = se.encode(w, mcfg, mel, n_frames)
    for i, c in enumerate(clips):
        m = se.mel_spectrogram(c, mcfg)
        t = m.shape[0]
        e1 = se.encode(w, mcfg, jnp.asarray(m[None]),
                       jnp.array([t], jnp.int32))
        np.testing.assert_allclose(np.asarray(eb[i]), np.asarray(e1[0]),
                                   atol=1e-3, rtol=1e-3)


def test_reflect_pad_time():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 6, 1))
    # valid length 4: values 0 1 2 3; pad 2 -> reflect: 2 1 | 0 1 2 3 | 2 1
    out = se._reflect_pad_time(x, 2, jnp.array([4], jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(out[0, :8, 0]), [2, 1, 0, 1, 2, 3, 2, 1])
