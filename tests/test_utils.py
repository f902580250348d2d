"""Tracing/telemetry utility tests."""

import io
import time

from qwen3_tts_tpu.utils import StageTimer, log_memory, memory_snapshot, profile_trace


def test_stage_timer_accumulates_and_reports():
    t = StageTimer()
    with t.stage("Tokenize"):
        time.sleep(0.01)
    with t.stage("Generate"):
        time.sleep(0.02)
    t.add("Generate", 5.0)
    assert t.stages["Tokenize"] >= 10
    assert t.stages["Generate"] >= 25
    buf = io.StringIO()
    t.report(audio_seconds=1.0, file=buf)
    out = buf.getvalue()
    assert "Tokenize:" in out
    assert "RTF=" in out
    assert "x realtime" in out


def test_memory_snapshot_and_log():
    m = memory_snapshot()
    assert m["rss_peak_bytes"] > 0
    buf = io.StringIO()
    log_memory("test/label", file=buf)
    assert "[mem] test/label" in buf.getvalue()
    assert "rss=" in buf.getvalue()


def test_profile_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("QWEN3_TTS_PROFILE", raising=False)
    with profile_trace("x"):
        pass  # must be a no-op without the env var


def test_profile_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp
    with profile_trace("bench", trace_dir=str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # some trace artifact must exist
    assert any(tmp_path.rglob("*"))


def test_resample_empty_input():
    """Empty input resamples to empty (the reference returns an empty
    vector, qwen3_tts.cpp:83-101; this used to IndexError on x[-1])."""
    import numpy as np

    from qwen3_tts_tpu.runtime import audio_io
    out = audio_io.resample_linear(np.zeros(0, np.float32), 12500, 24000)
    assert out.shape == (0,) and out.dtype == np.float32
