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


def test_continuous_server_stress_mixed(engine, tmp_path):
    """Stress: 32 mixed-length requests over 8 slots, several turnovers,
    plus requests with unwritable output paths. Every request must get
    EXACTLY one OK/ERR line and the server must survive to the end."""
    n = 32
    texts = ["hello.", "hello world.", "hello world. hello world.",
             "hello hello hello."]
    lines = []
    outs = {}
    bad_idx = {5, 17, 29}  # unwritable output dir -> ERR expected
    for i in range(n):
        if i in bad_idx:
            out = str(tmp_path / "no_such_dir" / f"{i}.wav")
        else:
            out = str(tmp_path / f"s{i}.wav")
        outs[i] = out
        lines.append(f"{texts[i % len(texts)]}\t{out}")
    stdin = io.StringIO("\n".join(lines) + "\nquit\n")
    stdout = io.StringIO()
    params = TTSParams(temperature=0.0, print_timing=False, seed=0)
    rc = cli.run_server_continuous(engine, None, params, n_slots=8,
                                   max_frames=6, stdin=stdin, stdout=stdout)
    assert rc == 0
    got = [l for l in stdout.getvalue().strip().split("\n") if l]
    assert len(got) == n, f"expected {n} response lines, got {len(got)}"
    n_ok = sum(1 for l in got if l.startswith("OK\t"))
    n_err = sum(1 for l in got if l.startswith("ERR\t"))
    assert n_ok == n - len(bad_idx)
    assert n_err == len(bad_idx)
    # every good request produced its file; every OK line names one
    ok_files = {l.split("\t")[3] for l in got if l.startswith("OK\t")}
    expect_files = {outs[i] for i in range(n) if i not in bad_idx}
    assert ok_files == expect_files
    for f in expect_files:
        assert os.path.exists(f)
