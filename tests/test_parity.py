"""tools/parity.py end-to-end on the synthetic fixtures: the independent
torch reference and the JAX stack must agree per stage (the role of the
reference's export-time checks, export_code_predictor.py:315-331)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("safetensors.numpy")
pytest.importorskip("torch")

from .test_converter import make_codec_checkpoint, make_tts_checkpoint

ROOT = Path(__file__).resolve().parent.parent


def test_parity_tool_passes(tmp_path):
    rng = np.random.default_rng(7)
    tts = tmp_path / "hf_tts"
    tts.mkdir()
    make_tts_checkpoint(tts, rng)
    codec = tmp_path / "hf_codec"
    codec.mkdir()
    make_codec_checkpoint(codec, rng)
    out = tmp_path / "parity.npz"
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "parity.py"),
         "--tts", str(tts), "--codec", str(codec), "--out", str(out)],
        capture_output=True, text=True, timeout=800)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PARITY OK" in r.stderr
    dumps = np.load(out)
    assert "talker_hidden" in dumps and "vocoder_audio" in dumps
