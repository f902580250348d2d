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
    args = ap.parse_args()

    import os
    if args.kv is not None:
        os.environ["QWEN3_TTS_KV"] = args.kv
    if args.cache is not None:
        os.environ["QWEN3_TTS_CACHE"] = args.cache

    import jax
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

    for i in range(args.requests):
        cb.submit(f"request number {i}")

    t0 = time.monotonic()
    lat = []
    total_audio = 0.0
    n_done = 0
    n_failed = 0
    while cb.pending():
        for r in cb.step().values():
            if not r.success:
                # failure isolation returns error results instead of
                # raising; counting them as served would silently
                # deflate (or zero) the throughput metric
                n_failed += 1
                log(f"request FAILED: {r.error_msg}")
                continue
            lat.append(r.t_total_ms)
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
    import json
    print(json.dumps({
        "metric": f"aggregate_realtime_x_slots{args.slots}",
        "value": round(total_audio / wall, 2),
        "unit": "x_realtime",
        "vs_baseline": round(total_audio / wall / 1.01, 2),
    }))


if __name__ == "__main__":
    main()
