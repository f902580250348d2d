#!/usr/bin/env python3
"""Benchmark: batched Qwen3-TTS generation throughput on one TPU chip.

Measures the serving hot path at full 0.6B model scale (random weights —
identical FLOPs/bytes to real weights): per-frame latency of the fused
generation step (talker decode + 16-codebook predictor + on-device
sampling) at batch B concurrent streams, plus the 40-frame chunked
vocoder decode.

Headline metric: ms of compute per generated frame per stream at B
streams. The reference (Jetson Orin Nano) spends 80 ms per frame on its
single stream (BASELINE.md: 27.3 talker + 45.1 code-pred + 2.2 vocoder +
5.4 overhead); vs_baseline = 80 / ours.

Prints ONE JSON line on stdout; human detail goes to stderr.

Usage: python bench.py [--batch 16] [--chunks 5] [--max-frames 400]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    # B=160 is the measured sweet spot on one v5e chip: 49.6 ms/frame
    # (median of 3) vs the 80 ms realtime budget — 160 concurrent realtime
    # streams with 38% margin at per-stream 0.31 ms/frame (258x the
    # reference). B=192 fits nominally (73.3 ms) but breaches the budget
    # within run-to-run variance, so it is not the default claim.
    ap.add_argument("--batch", type=int, default=160)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3,
                    help="repeat the measured section; report the median "
                         "(tunnel variance is +-20%%)")
    ap.add_argument("--max-frames", type=int, default=400)
    ap.add_argument("--temperature", type=float, default=0.9)
    args = ap.parse_args()

    import jax

    # persistent compile cache: repeat bench runs skip the 20-100s compiles
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    def sync(x):
        # block_until_ready is unreliable on the experimental axon
        # platform; a host transfer is a true fence
        jax.device_get(jax.tree.leaves(x)[-1])

    from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig
    from qwen3_tts_tpu.models import talker, vocoder
    from qwen3_tts_tpu.models.weights import init_talker_weights_device
    from qwen3_tts_tpu.runtime.generate import (
        ctx_bucket, generate_chunk, init_state, make_consts, required_ctx)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = TalkerConfig()
    B = args.batch
    CHUNK = 40
    FRAME_BUDGET_MS = 80.0  # 12.5 Hz frame period

    t0 = time.monotonic()
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)
    sync(w)
    log(f"0.6B talker+code-pred weights initialized on device "
        f"({time.monotonic()-t0:.1f}s)")

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 1000, (B, 48)), jnp.int32)
    lens = jnp.full((B,), 48, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)

    t0 = time.monotonic()
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    ctx = required_ctx(prefill.prefill_embd.shape[1], args.max_frames, CHUNK)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(1))
    sync(state.logits)
    log(f"prefill B={B} ctx={ctx}: {(time.monotonic()-t0)*1e3:.0f} ms "
        f"(includes compile)")
    consts = make_consts(prefill, args.temperature, 1.05)

    def run_chunk(state):
        # production path: lock-step scalar KV write + bucketed read window
        read_ctx = ctx_bucket(int(np.asarray(state.n_past).max()),
                              CHUNK, ctx)
        return generate_chunk(w, cfg, state, consts, 50, CHUNK,
                              read_ctx=read_ctx, lockstep=True)

    # warmup (compile)
    t0 = time.monotonic()
    state, codes, valid = run_chunk(state)
    sync(codes)
    log(f"generate_chunk compile+first run: {time.monotonic()-t0:.1f}s")

    t0 = time.monotonic()
    for _ in range(args.chunks):
        state, codes, valid = run_chunk(state)
    sync(codes)
    gen_s = time.monotonic() - t0
    frames = args.chunks * CHUNK
    gen_ms_per_batchframe = gen_s * 1e3 / frames
    log(f"generation alone: {frames} frames x {B} streams in {gen_s:.2f}s "
        f"-> {gen_ms_per_batchframe:.2f} ms/frame (batch), "
        f"{gen_ms_per_batchframe/B:.3f} ms/frame/stream")

    # vocoder: batched 40-frame chunk decode at full scale (causal trim =
    # the streaming TRT-parity path, exactly CHUNK*1920 samples)
    vcfg = VocoderConfig()
    vw = vocoder.init_vocoder_weights(np.random.default_rng(1), vcfg)
    vw = vocoder.cast_weights(jax.device_put(vw))  # bf16 fast path
    vcodes = jnp.asarray(rng.integers(0, 2048, (B, CHUNK, 16)), jnp.int32)

    # production sub-batching (runtime/pipeline.py caps decode batches at
    # 48 to bound the 76,800-sample tail activations — [48, 76800, C] f32
    # buffers are ~1.4 GB each; B=96 whole-batch OOMs the 16 GB chip).
    # Past B=96 the talker KV cache (~59 MB/stream at ctx 512) crowds out
    # even the 48-wide buffers; shrink further.
    VOC_SUB = 48 if B <= 96 else (32 if B <= 128 else 16)

    def voc_decode(codes):
        n = codes.shape[0]
        if n <= VOC_SUB:
            return vocoder.vocoder_decode(vw, vcfg, codes, trim="causal")
        return jnp.concatenate(
            [vocoder.vocoder_decode(vw, vcfg, codes[i:i + VOC_SUB],
                                    trim="causal")
             for i in range(0, n, VOC_SUB)], axis=0)

    t0 = time.monotonic()
    try:
        audio = voc_decode(vcodes)
        sync(audio)
    except Exception as e:
        # The axon remote-compile helpers flake (HTTP 500) on a fraction
        # of Pallas compiles, which are not persistently cached. Fall
        # back to the XLA vocoder path rather than losing the benchmark
        # record (graceful degradation, same policy as ops/attention.py).
        log(f"fused vocoder kernels failed to compile ({type(e).__name__});"
            f" falling back to XLA chain")
        vocoder.set_res_chain_impl("xla")
        audio = voc_decode(vcodes)
        sync(audio)
    log(f"vocoder compile+first chunk: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    n_voc = 8
    for _ in range(n_voc):
        audio = voc_decode(vcodes)
    sync(audio)
    voc_s = time.monotonic() - t0
    voc_ms_per_batchframe = voc_s * 1e3 / (n_voc * CHUNK)
    log(f"vocoder alone: {voc_ms_per_batchframe:.2f} ms/frame "
        f"(batch of {B}), {voc_ms_per_batchframe/B:.3f} ms/frame/stream")

    # --- headline: the PIPELINED serving loop (runtime.pipeline's
    # schedule) — generation chunk k+1 is dispatched before chunk k's
    # codes are host-read and vocoder-decoded, so the device queue runs
    # gen k+1 | voc k back-to-back with no host-turnaround bubble.
    def pipelined_run(state):
        t0 = time.monotonic()
        state, codes_d, _ = run_chunk(state)
        for _ in range(args.chunks):
            state, codes_next, _ = run_chunk(state)      # enqueue gen k+1
            codes_h = np.asarray(codes_d)                # read chunk k
            audio = voc_decode(vcodes)                   # voc chunk k
            codes_d = codes_next
        np.asarray(codes_d)
        sync(audio)
        return time.monotonic() - t0, state

    _, state = pipelined_run(state)  # warm (donation consumes the input)
    totals = []
    for r in range(args.runs):
        dt, state = pipelined_run(state)
        totals.append(dt * 1e3 / ((args.chunks + 1) * CHUNK))
    total_ms_per_batchframe = sorted(totals)[len(totals) // 2]
    log(f"pipelined e2e: {['%.2f' % t for t in totals]} ms/frame over "
        f"{args.runs} runs -> median {total_ms_per_batchframe:.2f}")

    per_stream = total_ms_per_batchframe / B
    rtf = per_stream / FRAME_BUDGET_MS
    realtime_ok = total_ms_per_batchframe <= FRAME_BUDGET_MS
    overlap = (gen_ms_per_batchframe + voc_ms_per_batchframe
               - total_ms_per_batchframe)
    log(f"TOTAL: {total_ms_per_batchframe:.2f} ms/frame for {B} streams "
        f"(gen {gen_ms_per_batchframe:.1f} + voc {voc_ms_per_batchframe:.1f}"
        f" = {gen_ms_per_batchframe+voc_ms_per_batchframe:.1f} serial; "
        f"pipelining recovers {overlap:.1f}) "
        f"(budget {FRAME_BUDGET_MS:.0f} ms) -> per-stream RTF {rtf:.4f}; "
        f"{B} realtime streams {'OK' if realtime_ok else 'NOT met'}")

    print(json.dumps({
        "metric": f"ms_per_frame_per_stream_b{B}",
        "value": round(per_stream, 4),
        "unit": "ms",
        "vs_baseline": round(FRAME_BUDGET_MS / per_stream, 2),
    }))


if __name__ == "__main__":
    main()
