"""CLI and --serve protocol tests (stdin TSV -> stdout OK/ERR lines)."""

import dataclasses
import io
import os

import numpy as np
import pytest

from qwen3_tts_tpu import cli
from qwen3_tts_tpu.models import vocoder as voc_mod
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.runtime import audio_io
from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams

from .test_tokenizer import make_tiny_tokenizer


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(80)
    talker_cfg = tiny_talker_config()
    talker_w = init_talker_weights(rng, talker_cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    return Qwen3TTS.from_components(make_tiny_tokenizer(), talker_cfg,
                                    talker_w, voc_cfg, voc_w)


def test_parser_flags():
    p = cli.build_parser()
    args = p.parse_args(["-m", "models", "-t", "hi", "-o", "out.wav",
                         "--temperature", "0.5", "--top-k", "10",
                         "--max-tokens", "100", "--repetition-penalty", "1.1"])
    assert args.model == "models"
    assert args.temperature == 0.5
    assert args.top_k == 10
    assert args.max_tokens == 100
    assert args.repetition_penalty == 1.1
    # defaults match the reference (main.cpp:17-21, qwen3_tts.h:18-43)
    d = p.parse_args(["-m", "m"])
    assert d.output == "output.wav"
    assert d.temperature == 0.9
    assert d.top_k == 50
    assert d.top_p == 1.0
    assert d.max_tokens == 4096
    assert d.repetition_penalty == 1.05


def test_serve_protocol(engine, tmp_path):
    out1 = str(tmp_path / "a.wav")
    out2 = str(tmp_path / "b.wav")
    stdin = io.StringIO(
        f"hello world.\t{out1}\n"
        f"hello.\t{out2}\n"
        "quit\n")
    stdout = io.StringIO()
    params = TTSParams(max_audio_tokens=12, temperature=0.0,
                       print_timing=False, seed=0)
    rc = cli.run_server(engine, None, params, batch=1,
                        stdin=stdin, stdout=stdout)
    assert rc == 0
    lines = stdout.getvalue().strip().split("\n")
    assert len(lines) == 2
    for line, out in zip(lines, (out1, out2)):
        parts = line.split("\t")
        assert parts[0] == "OK"
        assert float(parts[1]) > 0       # duration seconds
        assert float(parts[2]) > 0       # wall ms
        assert parts[3] == out
        assert os.path.exists(out)
        samples, sr = audio_io.load_wav(out)
        assert sr == engine.voc_cfg.sample_rate
        assert len(samples) > 0


def test_serve_batched(engine, tmp_path):
    """--batch 2: two queued requests synthesized in one lock-step batch."""
    out1 = str(tmp_path / "c.wav")
    out2 = str(tmp_path / "d.wav")
    stdin = io.StringIO(f"hello.\t{out1}\nhello world.\t{out2}\nquit\n")
    stdout = io.StringIO()
    params = TTSParams(max_audio_tokens=12, temperature=0.0,
                       print_timing=False, seed=0)
    rc = cli.run_server(engine, None, params, batch=2,
                        stdin=stdin, stdout=stdout)
    assert rc == 0
    lines = stdout.getvalue().strip().split("\n")
    assert len(lines) == 2
    assert all(l.startswith("OK\t") for l in lines)
    assert os.path.exists(out1) and os.path.exists(out2)


def test_serve_default_output_and_blank_lines(engine, tmp_path):
    os.chdir(tmp_path)
    stdin = io.StringIO("\nhello.\nexit\n")
    stdout = io.StringIO()
    params = TTSParams(max_audio_tokens=8, temperature=0.0,
                       print_timing=False, seed=0)
    cli.run_server(engine, None, params, stdin=stdin, stdout=stdout)
    line = stdout.getvalue().strip()
    assert line.startswith("OK\t")
    assert line.endswith("output.wav")
    assert os.path.exists(tmp_path / "output.wav")


def test_resolve_embedding_rejects_wrong_size(engine, tmp_path):
    """A stale/truncated .embd whose length doesn't match the model's
    hidden size must be rejected at load time (re-encoded if --reference
    is available), not fed into the jitted prefill to die on a cryptic
    broadcast error."""
    p = str(tmp_path / "stale.embd")
    audio_io.save_embedding(p, np.zeros(7, np.float32))
    emb = cli.resolve_embedding(engine, p, None)
    assert emb is None


def test_serve_batched_burst_on_real_pipe(engine, tmp_path):
    """A burst client piping N lines at once must still lock-step batch.

    Regression for the select()-only readiness check: `for line in
    stdin` readahead pulled every available byte into Python's buffer,
    select() then reported not-ready, and each request flushed alone —
    --batch was a no-op on real pipes (StringIO tests masked it).
    _LineSource owns the readahead, so queued lines stay visible."""

    class _RecordBatches:
        def __init__(self, inner):
            self._inner = inner
            self.batch_sizes = []

        def synthesize_batch(self, texts, embs, params):
            self.batch_sizes.append(len(texts))
            return self._inner.synthesize_batch(texts, embs, params)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    outs = [str(tmp_path / f"burst{i}.wav") for i in range(3)]
    r_fd, w_fd = os.pipe()
    with os.fdopen(w_fd, "w") as w:
        for i, out in enumerate(outs):
            w.write(f"hello world {i}.\t{out}\n")
        w.write("quit\n")
    # all four lines now sit in the OS pipe; the write end is closed
    rec = _RecordBatches(engine)
    params = TTSParams(max_audio_tokens=8, temperature=0.0,
                       print_timing=False, seed=0)
    stdout = io.StringIO()
    with os.fdopen(r_fd, "r") as stdin:
        rc = cli.run_server(rec, None, params, batch=3,
                            stdin=stdin, stdout=stdout)
    assert rc == 0
    assert rec.batch_sizes == [3], (
        f"burst of 3 piped requests must synthesize as one lock-step "
        f"batch, got calls of sizes {rec.batch_sizes}")
    lines = stdout.getvalue().strip().split("\n")
    assert len(lines) == 3 and all(l.startswith("OK\t") for l in lines)
    assert all(os.path.exists(o) for o in outs)
