"""CLI main() end-to-end over a real model directory: synthetic HF
checkpoints -> converter -> GGUF files -> load_models -> synth -> WAV.

The only test that drives the full file-based load path
(load_models, qwen3_tts.cpp:107-230 parity)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from qwen3_tts_tpu import cli
from qwen3_tts_tpu.runtime import audio_io

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

safetensors = pytest.importorskip("safetensors.numpy")

from .test_converter import make_codec_checkpoint, make_tts_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import convert_checkpoints as cc
    rng = np.random.default_rng(200)
    root = tmp_path_factory.mktemp("models")
    tts_ckpt = root / "hf_tts"
    tts_ckpt.mkdir()
    make_tts_checkpoint(tts_ckpt, rng)
    codec_ckpt = root / "hf_codec"
    codec_ckpt.mkdir()
    make_codec_checkpoint(codec_ckpt, rng)
    mdir = root / "models"
    mdir.mkdir()
    cc.convert_tts(tts_ckpt, mdir / "qwen3-tts-0.6b-f16.gguf", "f32")
    cc.convert_codec(codec_ckpt, mdir / "qwen3-tts-tokenizer-f16.gguf", "f32")
    return str(mdir)


def test_cli_single_shot(model_dir, tmp_path):
    out = str(tmp_path / "out.wav")
    rc = cli.main(["-m", model_dir, "-t", "a b a", "-o", out,
                   "--max-tokens", "6", "--temperature", "0",
                   "--seed", "0"])
    assert rc == 0
    samples, sr = audio_io.load_wav(out)
    assert sr == 24000
    assert len(samples) > 0


def test_cli_missing_text(model_dir):
    rc = cli.main(["-m", model_dir])
    assert rc == 1


def test_cli_load_failure(tmp_path):
    rc = cli.main(["-m", str(tmp_path / "nope"), "-t", "x"])
    assert rc == 1
