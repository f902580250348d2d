"""Acceptance harness (tools/acceptance.py).

The synthetic-path test proves the whole sequence executes end-to-end
today; the real-weight test is the documented acceptance run for the
moment checkpoints appear (skipped without them) — the analogue of the
reference's export-time parity checks + golden tokenizer vectors
(export_code_predictor.py:315-331, tests/test_tokenizer.cpp:13-15).

Real run:
  QWEN3_TTS_HF_TTS_DIR=<hf_tts> QWEN3_TTS_HF_CODEC_DIR=<hf_codec> \
      python -m pytest tests/test_acceptance.py -k real
or directly:
  python tools/acceptance.py --hf-tts <dir> --hf-codec <dir> --real
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("safetensors.numpy")
pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from .test_converter import make_codec_checkpoint, make_tts_checkpoint


def test_acceptance_synthetic(tmp_path):
    """Every acceptance step runs and passes on the synthetic fixtures
    (golden tokenizer ids are gated behind real=True; everything else is
    fully enforced)."""
    import acceptance

    rng = np.random.default_rng(11)
    tts = tmp_path / "hf_tts"
    tts.mkdir()
    make_tts_checkpoint(tts, rng)
    codec = tmp_path / "hf_codec"
    codec.mkdir()
    make_codec_checkpoint(codec, rng)

    # a speaker reference wav for the cloning steps (content is arbitrary;
    # the path exercises mel + ECAPA + .embd round-trip)
    from qwen3_tts_tpu.runtime import audio_io
    wav = tmp_path / "ref.wav"
    audio_io.save_wav(str(wav),
                      rng.standard_normal(24000).astype(np.float32) * 0.1,
                      24000)

    results = acceptance.run_acceptance(
        tts, codec, tmp_path / "work", real=False, ref_wav=wav,
        out_type="f32", text="a b a", max_tokens=6)
    failed = [r for r in results if not r["ok"]]
    assert not failed, failed
    steps = {r["step"] for r in results}
    assert {"convert", "parity", "tokenizer_roundtrip", "load_models",
            "synthesize", "wav_roundtrip", "speaker_embd",
            "synthesize_cloned"} <= steps


@pytest.mark.skipif(
    not (os.environ.get("QWEN3_TTS_HF_TTS_DIR")
         and os.environ.get("QWEN3_TTS_HF_CODEC_DIR")),
    reason="real checkpoints not available (set QWEN3_TTS_HF_TTS_DIR and "
           "QWEN3_TTS_HF_CODEC_DIR)")
def test_acceptance_real(tmp_path):
    """The full real-weight acceptance run, incl. the reference's golden
    tokenizer vectors (test_tokenizer.cpp:13-15)."""
    import acceptance

    ref_wav = os.environ.get("QWEN3_TTS_REF_WAV")
    ab_wav = os.environ.get("QWEN3_TTS_AB_WAV")
    results = acceptance.run_acceptance(
        Path(os.environ["QWEN3_TTS_HF_TTS_DIR"]),
        Path(os.environ["QWEN3_TTS_HF_CODEC_DIR"]),
        tmp_path / "work", real=True,
        ref_wav=Path(ref_wav) if ref_wav else None,
        ab_wav=Path(ab_wav) if ab_wav else None)
    failed = [r for r in results if not r["ok"]]
    assert not failed, failed
