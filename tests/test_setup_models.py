"""End-to-end run of the model setup driver (tools/setup_models.py) on
synthetic HF checkpoints — everything the reference's
setup_pipeline_models.py does except the network download
(setup_pipeline_models.py:99-299): convert both checkpoints, verify the
GGUFs load, and prove the emitted model directory drives the pipeline."""

import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("safetensors.numpy")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from .test_converter import make_codec_checkpoint, make_tts_checkpoint


def test_setup_models_skip_download(tmp_path, monkeypatch):
    import setup_models

    rng = np.random.default_rng(7)
    base = tmp_path / "hf_base"
    base.mkdir()
    make_tts_checkpoint(base, rng)
    codec = tmp_path / "hf_codec"
    codec.mkdir()
    make_codec_checkpoint(codec, rng)
    models = tmp_path / "models"

    monkeypatch.setattr(sys, "argv", [
        "setup_models.py", "--skip-download",
        "--models-dir", str(models),
        "--base-dir", str(base),
        "--tokenizer-dir", str(codec),
        "--type", "f32",
    ])
    assert setup_models.main() == 0
    tts = models / "qwen3-tts-0.6b-f16.gguf"
    tok = models / "qwen3-tts-tokenizer-f16.gguf"
    assert tts.exists() and tok.exists()

    # re-run: conversion is skipped, still exits 0 (idempotent)
    assert setup_models.main() == 0

    # the produced directory is the layout the runtime consumes
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS
    engine = Qwen3TTS()
    assert engine.load_models(str(models)), engine.error_msg
    ids = engine.tokenizer.encode_for_tts("a b")
    assert len(ids) > 0


def test_setup_models_missing_checkpoint(tmp_path, monkeypatch):
    import setup_models

    monkeypatch.setattr(sys, "argv", [
        "setup_models.py", "--skip-download",
        "--models-dir", str(tmp_path / "models"),
        "--base-dir", str(tmp_path / "nope"),
        "--tokenizer-dir", str(tmp_path / "nope2"),
    ])
    assert setup_models.main() == 1


def test_setup_models_warns_on_type_mismatch(tmp_path, monkeypatch,
                                             capsys):
    """Re-running with a different --type must warn that the existing
    GGUF carries a different quantization instead of silently reporting
    the directory ready (it used to print only '[skip] ... exists')."""
    import setup_models

    rng = np.random.default_rng(9)
    base = tmp_path / "hf_base"
    base.mkdir()
    make_tts_checkpoint(base, rng, intermediate=256)
    codec = tmp_path / "hf_codec"
    codec.mkdir()
    make_codec_checkpoint(codec, rng)
    models = tmp_path / "models"

    def run(out_type):
        monkeypatch.setattr(sys, "argv", [
            "setup_models.py", "--skip-download",
            "--models-dir", str(models),
            "--base-dir", str(base),
            "--tokenizer-dir", str(codec),
            "--type", out_type,
        ])
        return setup_models.main()

    assert run("f16") == 0
    capsys.readouterr()
    assert run("q8_0") == 0          # skipped, but must warn
    err = capsys.readouterr().err
    assert "WARNING" in err and "q8_0" in err
    assert run("f16") == 0           # matching type: plain skip line
    err = capsys.readouterr().err
    assert "WARNING" not in err
