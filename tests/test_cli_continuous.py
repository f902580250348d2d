"""Continuous --serve mode protocol test."""

import dataclasses
import io
import os

import numpy as np
import pytest

from qwen3_tts_tpu import cli
from qwen3_tts_tpu.models import vocoder as voc_mod
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams

from .test_tokenizer import make_tiny_tokenizer


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(95)
    talker_cfg = tiny_talker_config()
    talker_w = init_talker_weights(rng, talker_cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    return Qwen3TTS.from_components(make_tiny_tokenizer(), talker_cfg,
                                    talker_w, voc_cfg, voc_w)


def test_continuous_server_protocol(engine, tmp_path):
    outs = [str(tmp_path / f"{i}.wav") for i in range(3)]
    stdin = io.StringIO(
        f"hello world.\t{outs[0]}\n"
        f"hello.\t{outs[1]}\n"
        f"hello hello.\t{outs[2]}\n"
        "quit\n")
    stdout = io.StringIO()
    params = TTSParams(temperature=0.0, print_timing=False, seed=0)
    rc = cli.run_server_continuous(engine, None, params, n_slots=2,
                                   max_frames=8, stdin=stdin, stdout=stdout)
    assert rc == 0
    lines = [l for l in stdout.getvalue().strip().split("\n") if l]
    assert len(lines) == 3
    assert all(l.startswith("OK\t") for l in lines)
    reported = {l.split("\t")[3] for l in lines}
    assert reported == set(outs)
    for o in outs:
        assert os.path.exists(o)
