"""Speaker encoder: log-mel frontend + ECAPA-TDNN -> 1024-d voice embedding.

TPU-native rebuild of the reference's AudioTokenizerEncoder
(audio_tokenizer_encoder.cpp):

  - mel frontend (:281-364): reflect pad (n_fft-hop)/2, centered periodic
    Hann, magnitude STFT, slaney mel filterbank, log(clamp(1e-5)).
    The reference computes a naive O(frames * n_fft^2) DFT per frame
    (:96-106); here there are two equivalent implementations: a numpy
    real-FFT (`mel_spectrogram`, single clip, host-side) and a jitted
    batched device version (`mel_spectrogram_batch`) used by the bulk
    voice-enrollment path so the whole encode runs on-device.
  - ECAPA graph (:438-694): conv0 k=5 (reflect pad) + 3 SE-Res2Net blocks
    (scale=8, dilations 2/3/4) + MFA concat -> attentive statistics
    pooling -> FC -> embedding[1024].

TPU design note: the graph is jitted once per *bucketed* frame count with
an explicit valid-length mask threaded through every global pooling op and
reflect pad (the reference rebuilds its graph per exact length instead).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeakerEncoderConfig

WDT = jnp.float32
NEG_INF = float(jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------------------
# Mel frontend (host-side numpy; exact reference parameters)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(hz: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(hz < min_log_hz, hz / f_sp,
                    min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep)


def _mel_to_hz_slaney(mel: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel < min_log_mel, f_sp * mel,
                    min_log_hz * np.exp(logstep * (mel - min_log_mel)))


def mel_filterbank_slaney(n_mels: int, n_fft: int, sample_rate: int,
                          f_min: float, f_max: float) -> np.ndarray:
    """librosa-compatible slaney-normalized triangular mel filterbank
    (compute_mel_filterbank_slaney, audio_tokenizer_encoder.cpp:16-94)."""
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(_hz_to_mel_slaney(np.float64(f_min)),
                          _hz_to_mel_slaney(np.float64(f_max)), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fft_freqs = np.arange(n_bins) * sample_rate / n_fft

    fb = np.zeros((n_mels, n_bins), np.float32)
    for m in range(n_mels):
        f_l, f_c, f_r = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        enorm = 2.0 / (f_r - f_l)
        up = (fft_freqs - f_l) / max(f_c - f_l, 1e-10)
        down = (f_r - fft_freqs) / max(f_r - f_c, 1e-10)
        tri = np.where(
            (fft_freqs >= f_l) & (fft_freqs <= f_c), up,
            np.where((fft_freqs > f_c) & (fft_freqs <= f_r), down, 0.0))
        fb[m] = (enorm * tri).astype(np.float32)
    return fb


def mel_spectrogram(samples: np.ndarray,
                    cfg: SpeakerEncoderConfig) -> np.ndarray:
    """Log-mel [n_frames, n_mels] matching compute_mel_spectrogram
    (audio_tokenizer_encoder.cpp:281-364) bit-for-bit in formula, with an
    FFT instead of the naive DFT."""
    n = len(samples)
    pad = (cfg.n_fft - cfg.hop_length) // 2

    idx = np.arange(-pad, n + pad)
    idx = np.where(idx < 0, -idx, idx)
    idx = np.where(idx >= n, 2 * n - idx - 2, idx)
    idx = np.clip(idx, 0, n - 1)
    padded = samples[idx].astype(np.float32)

    n_frames = (len(padded) - cfg.n_fft) // cfg.hop_length + 1
    if n_frames <= 0:
        raise ValueError("audio too short for mel spectrogram")

    window = _centered_hann(cfg)

    starts = np.arange(n_frames) * cfg.hop_length
    frames = padded[starts[:, None] + np.arange(cfg.n_fft)[None, :]] * window
    spec = np.fft.rfft(frames, axis=1)
    mag = np.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).astype(np.float32)

    fb = mel_filterbank_slaney(cfg.n_mels, cfg.n_fft, cfg.sample_rate,
                               cfg.f_min, cfg.f_max)
    mel = mag @ fb.T                                      # [n_frames, n_mels]
    return np.log(np.maximum(mel, 1e-5)).astype(np.float32)


def _centered_hann(cfg: SpeakerEncoderConfig) -> np.ndarray:
    """Periodic Hann of win_length centered in an n_fft window
    (compute_centered_window, audio_tokenizer_encoder.cpp:109-118)."""
    window = np.zeros(cfg.n_fft, np.float32)
    off = (cfg.n_fft - cfg.win_length) // 2
    i = np.arange(cfg.win_length)
    window[off:off + cfg.win_length] = \
        0.5 * (1.0 - np.cos(2.0 * np.pi * i / cfg.win_length))
    return window


def mel_frames_for_samples(n_samples: int, cfg: SpeakerEncoderConfig) -> int:
    pad = (cfg.n_fft - cfg.hop_length) // 2
    return (n_samples + 2 * pad - cfg.n_fft) // cfg.hop_length + 1


def bucket_samples(n_samples: int, cfg: SpeakerEncoderConfig,
                   bucket_s: float = 1.0) -> int:
    """Round a clip length up to a whole-second bucket (one compiled
    mel/encode executable per bucket, like bucket_frames)."""
    step = max(int(cfg.sample_rate * bucket_s), 1)
    return max(((n_samples + step - 1) // step) * step, step)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram_batch(samples: jax.Array, n_samples: jax.Array,
                          cfg: SpeakerEncoderConfig):
    """Batched on-device log-mel, numerically matching `mel_spectrogram`.

    samples: [B, N] f32 zero-padded to a length bucket; n_samples: [B].
    Returns (mel [B, F, n_mels] f32, n_frames [B] int32) where
    F = mel_frames_for_samples(N) and rows >= n_frames[b] are zeroed
    (downstream `encode` masks on n_valid anyway).

    TPU notes: the reflect pad mirrors at each stream's VALID boundary
    (like _reflect_pad_time), the frame extraction is one static gather,
    and the STFT is jnp.fft.rfft — XLA lowers it to the TPU FFT custom
    call, replacing the reference's O(frames * n_fft^2) naive DFT
    (audio_tokenizer_encoder.cpp:96-106).
    """
    B, N = samples.shape
    pad = (cfg.n_fft - cfg.hop_length) // 2

    # reflect indices w.r.t. per-stream valid length
    p = jnp.arange(-pad, N + pad)[None, :]                  # [1, N+2p]
    n = n_samples[:, None]
    src = jnp.where(p < 0, -p, p)
    src = jnp.where(src >= n, 2 * n - src - 2, src)
    src = jnp.clip(src, 0, jnp.maximum(n - 1, 0)).astype(jnp.int32)
    padded = jnp.take_along_axis(samples.astype(jnp.float32), src, axis=1)

    F = (N + 2 * pad - cfg.n_fft) // cfg.hop_length + 1
    if F <= 0:
        raise ValueError("sample bucket too short for mel spectrogram")
    starts = jnp.arange(F) * cfg.hop_length
    idx = starts[:, None] + jnp.arange(cfg.n_fft)[None, :]   # [F, n_fft]
    frames = padded[:, idx] * jnp.asarray(_centered_hann(cfg))

    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).astype(jnp.float32)

    fb = jnp.asarray(mel_filterbank_slaney(
        cfg.n_mels, cfg.n_fft, cfg.sample_rate, cfg.f_min, cfg.f_max))
    mel = jnp.log(jnp.maximum(mag @ fb.T, 1e-5))             # [B, F, n_mels]

    n_frames = jnp.maximum(
        (n_samples + 2 * pad - cfg.n_fft) // cfg.hop_length + 1, 0
    ).astype(jnp.int32)
    valid = jnp.arange(F)[None, :] < n_frames[:, None]
    return jnp.where(valid[..., None], mel, 0.0), n_frames


# ---------------------------------------------------------------------------
# Weight loading / init
# ---------------------------------------------------------------------------

def _t(r, name):
    return jnp.asarray(r.tensor_data(name), WDT)


def load_speaker_encoder_weights(r, cfg: SpeakerEncoderConfig) -> dict[str, Any]:
    """spk_enc.* tensors from the TTS GGUF
    (audio_tokenizer_encoder.cpp:179-242)."""
    def blk(i):
        p = f"spk_enc.blk.{i}"
        return {
            "tdnn1_w": _t(r, f"{p}.tdnn1.weight"),
            "tdnn1_b": _t(r, f"{p}.tdnn1.bias"),
            "res2net_w": jnp.stack([_t(r, f"{p}.res2net.{j}.weight")
                                    for j in range(7)]),
            "res2net_b": jnp.stack([_t(r, f"{p}.res2net.{j}.bias")
                                    for j in range(7)]),
            "tdnn2_w": _t(r, f"{p}.tdnn2.weight"),
            "tdnn2_b": _t(r, f"{p}.tdnn2.bias"),
            "se1_w": _t(r, f"{p}.se.conv1.weight"),
            "se1_b": _t(r, f"{p}.se.conv1.bias"),
            "se2_w": _t(r, f"{p}.se.conv2.weight"),
            "se2_b": _t(r, f"{p}.se.conv2.bias"),
        }
    return {
        "conv0_w": _t(r, "spk_enc.conv0.weight"),
        "conv0_b": _t(r, "spk_enc.conv0.bias"),
        "blocks": [blk(i) for i in (1, 2, 3)],
        "mfa_w": _t(r, "spk_enc.mfa.weight"),
        "mfa_b": _t(r, "spk_enc.mfa.bias"),
        "asp_tdnn_w": _t(r, "spk_enc.asp.tdnn.weight"),
        "asp_tdnn_b": _t(r, "spk_enc.asp.tdnn.bias"),
        "asp_conv_w": _t(r, "spk_enc.asp.conv.weight"),
        "asp_conv_b": _t(r, "spk_enc.asp.conv.bias"),
        "fc_w": _t(r, "spk_enc.fc.weight"),
        "fc_b": _t(r, "spk_enc.fc.bias"),
    }


def tiny_speaker_encoder_config() -> SpeakerEncoderConfig:
    return SpeakerEncoderConfig(n_mels=8, n_fft=64, hop_length=16,
                                win_length=64, embedding_dim=16,
                                hidden_dim=16, res2net_scale=4, f_max=12000.0)


def init_speaker_encoder_weights(rng: np.random.Generator,
                                 cfg: SpeakerEncoderConfig) -> dict[str, Any]:
    h = cfg.hidden_dim
    branch = h // cfg.res2net_scale
    se_mid = max(h // 4, 1)
    mfa = 3 * h

    def rn(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, WDT)

    def blk():
        return {
            "tdnn1_w": rn(h, h, 1), "tdnn1_b": jnp.zeros((h,), WDT),
            "res2net_w": rn(cfg.res2net_scale - 1, branch, branch, 3),
            "res2net_b": jnp.zeros((cfg.res2net_scale - 1, branch), WDT),
            "tdnn2_w": rn(h, h, 1), "tdnn2_b": jnp.zeros((h,), WDT),
            "se1_w": rn(se_mid, h, 1), "se1_b": jnp.zeros((se_mid,), WDT),
            "se2_w": rn(h, se_mid, 1), "se2_b": jnp.zeros((h,), WDT),
        }
    return {
        "conv0_w": rn(h, cfg.n_mels, 5),
        "conv0_b": jnp.zeros((h,), WDT),
        "blocks": [blk() for _ in range(3)],
        "mfa_w": rn(mfa, mfa, 1), "mfa_b": jnp.zeros((mfa,), WDT),
        "asp_tdnn_w": rn(se_mid, mfa * 3, 1),
        "asp_tdnn_b": jnp.zeros((se_mid,), WDT),
        "asp_conv_w": rn(mfa, se_mid, 1), "asp_conv_b": jnp.zeros((mfa,), WDT),
        "fc_w": rn(cfg.embedding_dim, 2 * mfa, 1),
        "fc_b": jnp.zeros((cfg.embedding_dim,), WDT),
    }


# ---------------------------------------------------------------------------
# Forward ([B, T, C] layout with valid-length masking)
# ---------------------------------------------------------------------------

def _reflect_pad_time(x: jax.Array, pad: int, n_valid: jax.Array) -> jax.Array:
    """Reflect-pad along time w.r.t. each stream's valid length.

    Replaces the reference's concat-of-views construction
    (apply_reflect_pad_1d, audio_tokenizer_encoder.cpp:366-408), but
    reflects at the *valid* boundary so padded buckets stay exact.
    x: [B, T, C]; n_valid: [B] -> [B, T+2*pad, C].
    """
    B, T, C = x.shape
    p = jnp.arange(-pad, T + pad)[None, :]                      # [1, T+2p]
    n = n_valid[:, None]
    src = jnp.where(p < 0, -p, p)
    src = jnp.where(src >= n, 2 * n - src - 2, src)
    src = jnp.clip(src, 0, jnp.maximum(n - 1, 0))
    return jnp.take_along_axis(x, src[..., None].astype(jnp.int32), axis=1)


def _conv1d(x, w, b, n_valid, *, dilation: int = 1, reflect_pad: int = 0):
    """k>=1 conv; reflect padding when requested (stride 1)."""
    if reflect_pad > 0:
        x = _reflect_pad_time(x, reflect_pad, n_valid)
    wk = jnp.transpose(w, (2, 1, 0))
    y = jax.lax.conv_general_dilated(
        x, wk, window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    return y + b


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over time of valid positions. x: [B,T,C]; mask: [B,T]."""
    s = jnp.sum(x * mask[..., None], axis=1)
    return s / jnp.maximum(jnp.sum(mask, axis=1), 1.0)[:, None]


@_partial(jax.jit, static_argnames=("cfg",))
def encode(w, cfg: SpeakerEncoderConfig, mel: jax.Array,
           n_valid: jax.Array) -> jax.Array:
    """ECAPA-TDNN forward (build_graph, audio_tokenizer_encoder.cpp:438-694).

    mel: [B, T, n_mels] f32 (zero-padded to a bucket); n_valid: [B] frames.
    Returns embeddings [B, embedding_dim] f32.
    """
    B, T, _ = mel.shape
    mask = (jnp.arange(T)[None, :] < n_valid[:, None]).astype(jnp.float32)

    x = _conv1d(mel, w["conv0_w"], w["conv0_b"], n_valid, reflect_pad=2)
    x = jax.nn.relu(x)

    scale = cfg.res2net_scale
    branch = x.shape[-1] // scale
    block_outs = []
    for blk_w, dilation in zip(w["blocks"], (2, 3, 4)):
        residual = x
        x = jax.nn.relu(_conv1d(x, blk_w["tdnn1_w"], blk_w["tdnn1_b"], n_valid))
        # Res2Net: branch 0 identity; branch i>=1 conv(branch_i [+ prev out])
        # (audio_tokenizer_encoder.cpp:512-560)
        branches = jnp.split(x, scale, axis=-1)
        outs = [branches[0]]
        for bidx in range(1, scale):
            inp = branches[bidx] if bidx == 1 else branches[bidx] + outs[-1]
            y = _conv1d(inp, blk_w["res2net_w"][bidx - 1],
                        blk_w["res2net_b"][bidx - 1], n_valid,
                        dilation=dilation, reflect_pad=dilation)
            outs.append(jax.nn.relu(y))
        x = jnp.concatenate(outs, axis=-1)
        x = jax.nn.relu(_conv1d(x, blk_w["tdnn2_w"], blk_w["tdnn2_b"], n_valid))

        # Squeeze-Excitation over valid frames (:568-581)
        se = _masked_mean(x, mask)[:, None, :]
        se = jax.nn.relu(_conv1d(se, blk_w["se1_w"], blk_w["se1_b"], n_valid))
        se = jax.nn.sigmoid(_conv1d(se, blk_w["se2_w"], blk_w["se2_b"], n_valid))
        x = x * se + residual
        block_outs.append(x)

    # MFA concat of the three SE-Res2Net outputs (:595-606)
    x = jnp.concatenate(block_outs, axis=-1)
    x = jax.nn.relu(_conv1d(x, w["mfa_w"], w["mfa_b"], n_valid))

    # Attentive statistics pooling (:608-677)
    g_mean = _masked_mean(x, mask)
    g_sq = _masked_mean(x * x, mask)
    g_std = jnp.sqrt(jnp.clip(g_sq - g_mean * g_mean, 1e-12, 1e10))
    C = x.shape[-1]
    attn_in = jnp.concatenate(
        [x, jnp.broadcast_to(g_mean[:, None], (B, T, C)),
         jnp.broadcast_to(g_std[:, None], (B, T, C))], axis=-1)
    a = jax.nn.relu(_conv1d(attn_in, w["asp_tdnn_w"], w["asp_tdnn_b"], n_valid))
    a = jnp.tanh(a)
    a = _conv1d(a, w["asp_conv_w"], w["asp_conv_b"], n_valid)
    a = jnp.where(mask[..., None] > 0, a, NEG_INF)
    a = jax.nn.softmax(a, axis=1)                             # over time

    wm = jnp.sum(a * x * mask[..., None], axis=1)
    var = jnp.sum(a * (x - wm[:, None]) ** 2 * mask[..., None], axis=1)
    ws = jnp.sqrt(jnp.clip(var, 1e-12, 1e10))
    pooled = jnp.concatenate([wm, ws], axis=-1)[:, None, :]   # [B,1,2C]

    emb = _conv1d(pooled, w["fc_w"], w["fc_b"], n_valid)
    return emb[:, 0, :]


def bucket_frames(n_frames: int, bucket: int = 128) -> int:
    return max(((n_frames + bucket - 1) // bucket) * bucket, bucket)
