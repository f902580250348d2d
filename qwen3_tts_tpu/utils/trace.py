"""Tracing, profiling and memory telemetry.

TPU-native equivalent of the reference's hand-rolled observability
(SURVEY.md §5): monotonic per-stage wall times printed with RTF
(qwen3_tts.cpp:19-22, :536-549) and `[mem] label rss=… phys=…` snapshots
via getrusage (qwen3_tts.cpp:24-81) — plus what the reference lacks:
real per-op device profiles via jax.profiler (view with TensorBoard or
xprof) gated by QWEN3_TTS_PROFILE=<dir>.
"""

from __future__ import annotations

import contextlib
import os
import resource
import sys
import time
from dataclasses import dataclass, field


def _now_ms() -> float:
    return time.monotonic() * 1e3


@dataclass
class StageTimer:
    """Accumulates per-stage wall-clock ms; prints a reference-style
    timing report."""
    stages: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = _now_ms()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (_now_ms() - t0)

    def add(self, name: str, ms: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + ms

    def report(self, audio_seconds: float = 0.0, file=None) -> None:
        file = file or sys.stderr
        total = sum(self.stages.values())
        print("\nTiming:", file=file)
        for name, ms in self.stages.items():
            print(f"  {name + ':':<17}{ms:8.0f} ms", file=file)
        print(f"  {'Total:':<17}{total:8.0f} ms", file=file)
        if audio_seconds > 0 and total > 0:
            wall = total / 1e3
            print(f"  Audio duration:  {audio_seconds:.2f} s", file=file)
            print(f"  Throughput:      {audio_seconds / wall:.2f}x realtime "
                  f"(RTF={wall / audio_seconds:.3f})", file=file)
        file.flush()


def memory_snapshot() -> dict[str, int]:
    """Host RSS peak + device HBM in use."""
    # ru_maxrss is KB on Linux but BYTES on macOS
    _rss_scale = 1 if sys.platform == "darwin" else 1024
    out = {"rss_peak_bytes":
           resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * _rss_scale,
           "device_bytes_in_use": 0, "device_bytes_limit": 0}
    try:
        import jax
        stats = jax.devices()[0].memory_stats() or {}
        out["device_bytes_in_use"] = int(stats.get("bytes_in_use", 0))
        out["device_bytes_limit"] = int(stats.get("bytes_limit", 0))
    except Exception:
        pass
    return out


def log_memory(label: str, file=None) -> None:
    """`[mem] label rss=… device=…` (reference: qwen3_tts.cpp:72-81)."""
    file = file or sys.stderr
    m = memory_snapshot()
    def fmt(n):
        for unit in ("B", "KB", "MB", "GB", "TB"):
            if n < 1024 or unit == "TB":
                return f"{n:.2f} {unit}"
            n /= 1024
    print(f"  [mem] {label:<24} rss={fmt(m['rss_peak_bytes'])}  "
          f"device={fmt(m['device_bytes_in_use'])}", file=file, flush=True)


@contextlib.contextmanager
def profile_trace(label: str = "qwen3-tts", trace_dir: str | None = None):
    """jax.profiler trace scope, enabled by QWEN3_TTS_PROFILE=<dir> or an
    explicit trace_dir. No-op otherwise."""
    trace_dir = trace_dir or os.environ.get("QWEN3_TTS_PROFILE")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(label):
            yield
