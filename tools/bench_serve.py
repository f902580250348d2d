#!/usr/bin/env python3
"""Continuous-batching serving benchmark at full 0.6B scale.

Drives ContinuousBatcher with a churning request load (random token ids,
random weights) and reports sustained audio-seconds-per-wall-second and
per-request latency. Complements bench.py (per-frame compute) with the
serving-level view: slot turnover, admission prefills, and chunked
vocoder decode included.

Usage: python tools/bench_serve.py [--slots 16] [--requests 48]
                                   [--frames 120]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class RandomTokenizer:
    """Stand-in tokenizer: deterministic pseudo-random ids per text."""

    def __init__(self, vocab_size: int, n_tokens: int = 48):
        self.vocab_size = vocab_size
        self.n_tokens = n_tokens

    def encode_for_tts(self, text: str):
        import zlib

        import numpy as np
        # crc32, NOT hash(): str hash is salted per process
        # (PYTHONHASHSEED), which made the "deterministic" ids — and so
        # the EOS timing and the aggregate metric — vary run to run
        seed = zlib.crc32(text.encode()) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.integers(0, min(self.vocab_size, 1000),
                            self.n_tokens).tolist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--frames", type=int, default=120,
                    help="per-request frame cap (~9.6 s audio at 12.5 Hz)")
    ap.add_argument("--kv", choices=("bf16", "int8"), default=None,
                    help="talker KV dtype (sets QWEN3_TTS_KV)")
    ap.add_argument("--cache", choices=("stacked", "layered"), default=None,
                    help="talker KV cache layout (sets QWEN3_TTS_CACHE)")
    ap.add_argument("--talker", choices=("auto", "xla", "fused"),
                    default=None,
                    help="talker decode-step impl (sets QWEN3_TTS_TALKER; "
                         "fused = the 28-layer megakernel in ring-bitmask "
                         "mode, ops/talker_fused.py)")
    args = ap.parse_args()

    import os
    if args.kv is not None:
        os.environ["QWEN3_TTS_KV"] = args.kv
    if args.cache is not None:
        os.environ["QWEN3_TTS_CACHE"] = args.cache
    if args.talker is not None:
        os.environ["QWEN3_TTS_TALKER"] = args.talker

    import jax
    # honor JAX_PLATFORMS=cpu (sitecustomize pre-imports jax with the
    # axon platform; the env var alone is too late to avoid the tunnel)
    import os as _os
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig
    from qwen3_tts_tpu.models import vocoder
    from qwen3_tts_tpu.models.weights import init_talker_weights_device
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from qwen3_tts_tpu.runtime.serve import ContinuousBatcher

    cfg = TalkerConfig()
    log = lambda m: print(m, file=sys.stderr, flush=True)

    t0 = time.monotonic()
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)
    # one-element fence (a full-leaf device_get drags tens of MB through
    # the ~25 MB/s tunnel — see bench.py sync())
    jax.device_get(jax.tree.leaves(w)[-1].ravel()[:1])
    log(f"weights init {time.monotonic()-t0:.1f}s")

    vcfg = VocoderConfig()
    vw = vocoder.cast_weights(jax.device_put(
        vocoder.init_vocoder_weights(np.random.default_rng(1), vcfg)))

    engine = Qwen3TTS.from_components(
        RandomTokenizer(cfg.text_vocab_size), cfg, w, vcfg, vw)

    params = TTSParams(temperature=0.9, top_k=50, print_timing=False, seed=0)
    cb = ContinuousBatcher(engine, n_slots=args.slots, params=params,
                           max_frames=args.frames)

    # precompile every serving executable (gen buckets, admission,
    # vocoder buckets) so the measured load pays zero compile stalls
    t0 = time.monotonic()
    cb.warmup(token_buckets=(16, 48))   # RandomTokenizer emits 48 tokens
    rid = cb.submit("warmup")
    cb.run_all()
    log(f"warmup (compiles): {time.monotonic()-t0:.1f}s")

    # Time-to-first-audio instrumentation: every request gets an
    # on_audio callback that stamps the wall time of its FIRST decoded
    # chunk. TTFA is reported from ADMISSION (first_audio - submit -
    # queue wait) — the service-level metric a server controls under
    # deliberate oversubscription — alongside the from-submit number
    # and the queue wait itself. Target (VERDICT r3): admitted TTFA
    # <= 2x the 40-frame chunk duration.
    class FirstAudioStamp:
        t: float | None = None

        def __call__(self, samples, final):
            if self.t is None and len(samples):
                self.t = time.monotonic()

    submit_t: dict[int, float] = {}
    stamps: dict[int, FirstAudioStamp] = {}
    for i in range(args.requests):
        stamp = FirstAudioStamp()
        t_sub = time.monotonic()
        rid = cb.submit(f"request number {i}", on_audio=stamp)
        submit_t[rid] = t_sub
        stamps[rid] = stamp

    t0 = time.monotonic()
    lat = []
    ttfa_submit, ttfa_admit, queue_wait = [], [], []
    total_audio = 0.0
    n_done = 0
    n_failed = 0
    while cb.pending():
        for rid, r in cb.step().items():
            if not r.success:
                # failure isolation returns error results instead of
                # raising; counting them as served would silently
                # deflate (or zero) the throughput metric
                n_failed += 1
                log(f"request FAILED: {r.error_msg}")
                continue
            lat.append(r.t_total_ms)
            stamp = stamps.get(rid)
            if stamp is not None and stamp.t is not None:
                from_submit = (stamp.t - submit_t[rid]) * 1e3
                ttfa_submit.append(from_submit)
                ttfa_admit.append(from_submit - r.t_queue_ms)
                queue_wait.append(r.t_queue_ms)
            total_audio += len(r.audio) / r.sample_rate
            n_done += 1
    wall = time.monotonic() - t0
    if n_failed:
        import json
        print(json.dumps({
            "metric": f"aggregate_realtime_x_slots{args.slots}",
            "value": 0, "unit": "x_realtime", "vs_baseline": 0,
            "error": f"{n_failed}/{n_failed + n_done} requests failed"}))
        sys.exit(2)
    lat = np.asarray(lat)
    log(f"served {n_done} requests in {wall:.1f}s wall")
    log(f"audio generated: {total_audio:.1f}s "
        f"-> {total_audio / wall:.1f}x realtime aggregate")
    log(f"request latency ms: p50={np.percentile(lat,50):.0f} "
        f"p90={np.percentile(lat,90):.0f} max={lat.max():.0f}")
    ttfa_p50 = ttfa_p99 = -1.0
    if ttfa_admit:
        ta = np.asarray(ttfa_admit)
        ts = np.asarray(ttfa_submit)
        qw = np.asarray(queue_wait)
        ttfa_p50 = float(np.percentile(ta, 50))
        ttfa_p99 = float(np.percentile(ta, 99))
        # 40 frames @ 12.5 Hz = 3.2 s of audio per chunk
        chunk_ms = 40 / 12.5 * 1e3
        target = 2 * chunk_ms
        verdict = "MET" if ttfa_p99 <= target else "MISSED"
        log(f"ttfa (admitted) ms: p50={ttfa_p50:.0f} p99={ttfa_p99:.0f} "
            f"max={ta.max():.0f}  [target p99<={target:.0f} {verdict}]")
        log(f"ttfa (from submit) ms: p50={np.percentile(ts,50):.0f} "
            f"p99={np.percentile(ts,99):.0f}")
        log(f"queue wait ms: p50={np.percentile(qw,50):.0f} "
            f"p99={np.percentile(qw,99):.0f} max={qw.max():.0f} "
            f"({len(ta)}/{n_done} requests measured)")
    import json
    print(json.dumps({
        "metric": f"aggregate_realtime_x_slots{args.slots}",
        "value": round(total_audio / wall, 2),
        "unit": "x_realtime",
        "vs_baseline": round(total_audio / wall / 1.01, 2),
        "ttfa_p50_ms": round(ttfa_p50, 1),
        "ttfa_p99_ms": round(ttfa_p99, 1),
    }))


if __name__ == "__main__":
    main()
