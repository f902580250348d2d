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

Prints ONE JSON line on stdout; human detail goes to stderr. The JSON
records which vocoder residual-chain implementation ACTUALLY ran
("voc_impl": "fused"/"xla") so a compile-flake fallback can never
masquerade as the fused-kernel number (VERDICT r2 "what's weak" #1).

Startup hygiene (VERDICT r3 "next" #8): the on-device weight init and
every generation/vocoder executable go through the AOT artifact cache
(runtime/aot.py), so a warm run spends its tunnel time measuring, not
initializing (r3 logs: 12-528 s variance on the identical init program).
`--ladder` measures several configs in ONE process — weights init once,
backend init once, one JSON line per config as each completes.

Usage: python bench.py [--batch 192] [--kv int8] [--cache layered]
       python bench.py --ladder 192:int8:layered,256:int8:layered
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


CHUNK = 40
FRAME_BUDGET_MS = 80.0  # 12.5 Hz frame period


def voc_sub_for(B: int) -> int:
    """Production vocoder sub-batching (runtime/pipeline.py caps decode
    batches to bound the 76,800-sample tail activations — [48, 76800, C]
    f32 buffers are ~1.4 GB each; B=96 whole-batch OOMs the 16 GB chip).
    Past B=96 the talker KV cache (~59 MB/stream bf16 at ctx 512) crowds
    out even the 48-wide buffers; B>192 the gen chunk + vocoder working
    sets are resident CONCURRENTLY in the pipelined loop (16-wide tail
    OOMed next to the B=224 KV cache, r3); B>256 halves again."""
    if B <= 96:
        return 48
    if B <= 128:
        return 32
    if B <= 192:
        return 16
    if B <= 256:
        return 8
    return 4


def measure_entry(*, B: int, kv: str, cache: str | None,
                  talker_impl: str | None, args, cfg, w,
                  vcfg, vw, aot, jax, jnp, np) -> dict:
    """Measure one (batch, kv-dtype, cache-layout, talker-impl) config;
    returns the JSON record. Weights are shared across ladder entries."""
    import os

    from qwen3_tts_tpu.models import talker, vocoder
    from qwen3_tts_tpu.models.code_predictor import \
        _resolve_impl as cp_impl
    from qwen3_tts_tpu.runtime.generate import (
        ctx_bucket, generate_chunk, init_state, kv_layered_enabled,
        kv_quant_enabled, make_consts, required_ctx)

    os.environ["QWEN3_TTS_KV"] = kv      # read dynamically downstream
    if cache is not None:
        os.environ["QWEN3_TTS_CACHE"] = cache
    talker.set_talker_step_impl(talker_impl)
    layout = "layered" if kv_layered_enabled() else "stacked"
    tk = talker._resolve_impl()

    def sync(x):
        # block_until_ready is unreliable on the experimental axon
        # platform; a host transfer is a true fence. Read ONE element,
        # not the whole array: the tunnel downloads at 24-36 MB/s
        # (NOTES.md round 3), so a full-leaf device_get of the B=160
        # audio batch (49 MB f32) costs ~2 s of pure network time and
        # was inflating BENCH_r02's timed sections by 6-12 ms/frame.
        leaf = jax.tree.leaves(x)[-1]
        jax.device_get(leaf.ravel()[:1])

    rng = np.random.default_rng(0)
    tok_hi = min(1000, cfg.text_vocab_size)   # --tiny has a 512 vocab
    tokens = jnp.asarray(rng.integers(0, tok_hi, (B, 48)), jnp.int32)
    lens = jnp.full((B,), 48, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)

    t0 = time.monotonic()
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    ctx = required_ctx(prefill.prefill_embd.shape[1], args.max_frames, CHUNK)
    # NB round-3 fix: --kv int8 used to set the env var only; init_state
    # defaulted kv_quant=False, so earlier "int8" ladders (bench_r3_*.log)
    # actually measured bf16 caches — which also explains their B=256
    # init_state OOM (256 x 59 MB bf16 KV > HBM).
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(1),
                       kv_quant=kv_quant_enabled(),
                       kv_layered=kv_layered_enabled())
    sync(state.logits)
    log(f"prefill B={B} ctx={ctx}: {(time.monotonic()-t0)*1e3:.0f} ms "
        f"(includes compile)")
    consts = make_consts(prefill, args.temperature, 1.05)
    greedy = args.temperature <= 0.0

    # Generation executables per read-ctx bucket, AOT-cached (embeds the
    # Pallas code-pred megakernel; get_or_compile retries the flaky
    # remote Pallas compiles and persists the artifact — warm runs
    # deserialize in seconds instead of recompiling for minutes).
    gen_execs: dict[int, object] = {}

    def gen_fn(rc: int):
        fn = gen_execs.get(rc)
        if fn is None:
            # impl switches are trace-time state baked into the
            # executable: key them so a cached artifact can never carry
            # a different talker/codepred kernel than this entry selects
            name = (f"bench-gen-b{B}-c{ctx}-rc{rc}-kv{kv}-cl{layout}"
                    f"-k50-g{int(greedy)}-tk{tk}-cp{cp_impl()}")
            fn = aot.get_or_compile(
                name, generate_chunk, w, cfg, state, consts, 50, CHUNK,
                greedy=greedy, read_ctx=rc, lockstep=True,
                retries=args.compile_retries)
            gen_execs[rc] = fn
        return fn

    # Attention read-window coverage tracked HOST-side (the pipeline /
    # serving-ring policy): no np.asarray(state.n_past) lands between
    # chunk dispatches, so the device queue stays full and no device
    # error can surface at a readback the loop didn't need (the r3
    # B=224 OOM surfaced at exactly that np.asarray).
    prefill_cov = prefill.prefill_embd.shape[1]
    steps_dispatched = 0

    def run_chunk(state):
        nonlocal steps_dispatched
        rc = ctx_bucket(prefill_cov + steps_dispatched, CHUNK, ctx)
        steps_dispatched += CHUNK
        return gen_fn(rc)(w, state, consts)

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
    vcodes = jnp.asarray(rng.integers(0, 2048, (B, CHUNK, 16)), jnp.int32)
    # int8 KV halves the cache's HBM footprint (~5.6 GB freed at B=192 /
    # ctx 512), making room for wider vocoder sub-batches than the bf16
    # table assumed; --voc-sub overrides for the A/B.
    VOC_SUB = args.voc_sub or voc_sub_for(B)

    # ONE dispatch for the whole batch: lax.map over VOC_SUB-wide
    # sub-batches inside a single executable (vocoder.py). The
    # python-loop version paid B/VOC_SUB tunnel dispatches; under tunnel
    # congestion those dominated (measured 51 vs ~15 ms/frame at B=160).
    # AOT-cached like the gen step; the artifact embeds the fused Pallas
    # res-chain kernels, and get_or_compile's retry loop covers the
    # flaky remote Pallas compiles (HTTP 500 on ~40%, NOTES.md).
    vocoder.reset_res_chain_traced()
    t0 = time.monotonic()
    used_fallback = False
    try:
        voc_exec = aot.get_or_compile(
            f"bench-voc-b{B}-sub{VOC_SUB}-fused",
            vocoder.vocoder_decode_subbatched, vw, vcfg, vcodes,
            trim="causal", sub=VOC_SUB, retries=args.compile_retries)
    except Exception as e:
        log(f"fused vocoder failed to compile after retries "
            f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
            f"XLA chain — recorded numbers are the DEGRADED path")
        used_fallback = True
        vocoder.set_res_chain_impl("xla")
        try:
            voc_exec = aot.get_or_compile(
                f"bench-voc-b{B}-sub{VOC_SUB}-xla",
                vocoder.vocoder_decode_subbatched, vw, vcfg, vcodes,
                trim="causal", sub=VOC_SUB, retries=args.compile_retries)
        finally:
            # scope the degradation to THIS entry: a flaky fused compile
            # at rung k must not silently demote rungs k+1..n
            vocoder.set_res_chain_impl("auto")

    def voc_decode(codes):
        return voc_exec(vw, codes)

    audio = voc_decode(vcodes)
    sync(audio)
    # OBSERVED at trace time (vocoder._res_chain records which impl each
    # chain actually used — the silent ValueError fallback made the old
    # backend-inferred label exactly the masquerade this JSON field
    # exists to prevent). An artifact loaded from the AOT cache never
    # traces ("untraced"); the impl is then the one baked into the
    # artifact's name, which the load path selected above.
    voc_impl = vocoder.res_chain_impl_traced()
    if voc_impl == "untraced":
        voc_impl = "aot:xla" if used_fallback else "aot:fused"
    log(f"vocoder compile+first chunk: {time.monotonic()-t0:.1f}s "
        f"(impl={voc_impl})")

    if args.check_fused and voc_impl.endswith("fused"):
        # parity: compiled fused kernels vs the XLA chain at this shape
        # (ADVICE r2: the Mosaic path was parity-tested only interpreted)
        # Each side gets a FRESH jit wrapper: the impl switch is read
        # at trace time, so reusing the module-level jitted
        # vocoder_decode would cache-hit on identical avals/statics and
        # compare the fused executable TO ITSELF.
        sub = vcodes[:min(VOC_SUB, vcodes.shape[0])]
        decode_raw = vocoder.vocoder_decode.__wrapped__

        def fresh(impl):
            vocoder.set_res_chain_impl(impl)
            f = jax.jit(decode_raw,
                        static_argnames=("cfg", "trim", "pcm16"))
            for attempt in range(args.compile_retries):
                try:
                    return np.asarray(f(vw, vcfg, sub, trim="causal"))
                except Exception as e:
                    if attempt == args.compile_retries - 1:
                        raise
                    log(f"check-fused {impl} compile retry: "
                        f"{type(e).__name__}: {str(e)[:120]}")
                    time.sleep(2.0)

        try:
            a_fused = fresh("fused")
            a_xla = fresh("xla")
        finally:
            vocoder.set_res_chain_impl("auto")
        diff = float(np.max(np.abs(a_fused - a_xla)))
        log(f"fused-vs-XLA parity at B={sub.shape[0]}: max|diff|={diff:.2e}")
        assert diff < 2e-2, f"fused vocoder diverges from XLA: {diff}"

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
    def prefetch(a):
        # start the host copy at dispatch: it streams as soon as the
        # producing chunk computes, so the later np.asarray is ~free
        # (0.8 ms vs 45 ms blocking read of the [40,B,16] codes)
        try:
            a.copy_to_host_async()
        except Exception:
            pass

    def pipelined_run(state):
        t0 = time.monotonic()
        state, codes_d, _ = run_chunk(state)
        prefetch(codes_d)
        for _ in range(args.chunks):
            state, codes_next, _ = run_chunk(state)      # enqueue gen k+1
            prefetch(codes_next)
            codes_h = np.asarray(codes_d)                # read chunk k
            audio = voc_decode(vcodes)                   # voc chunk k
            codes_d = codes_next
        # decode the FINAL chunk too: chunks+1 gens must pair with
        # chunks+1 decodes or the per-frame divide under-counts vocoder
        # work by 1/(chunks+1) (~25% at --chunks 3)
        np.asarray(codes_d)
        audio = voc_decode(vcodes)
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

    return {
        "metric": f"ms_per_frame_per_stream_b{B}",
        "value": round(per_stream, 4),
        "unit": "ms",
        "vs_baseline": round(FRAME_BUDGET_MS / per_stream, 2),
        "voc_impl": voc_impl,
        "kv": kv,
        "cache_layout": layout,
        "talker_impl": tk,
        "gen_ms_per_frame": round(gen_ms_per_batchframe, 2),
        "voc_ms_per_frame": round(voc_ms_per_batchframe, 2),
        "total_ms_per_frame": round(total_ms_per_batchframe, 2),
        "realtime_streams_ok": realtime_ok,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    # B=192 is the round-3 sweet spot on one v5e chip: 34.9 ms/frame vs
    # the 80 ms realtime budget — 192 concurrent realtime streams at 56%
    # margin, 0.182 ms/frame/stream (440x the reference); B=160: 29.4 ms
    # (436x). Both measured with bf16 KV (see --kv below).
    ap.add_argument("--batch", type=int, default=192)
    # Default int8: measured winner of the round-5 ladder (one process,
    # NOTES.md round 5): at B=192 int8 cuts gen 26.1 -> 19.8 ms/frame
    # (e2e 37.4 -> 31.1, 494x vs 411x); bf16 remains the A/B control.
    ap.add_argument("--kv", choices=("int8", "bf16"), default="int8",
                    help="talker KV cache dtype (int8 halves KV memory "
                         "+ read bandwidth; code predictor stays bf16 "
                         "per the reference constraint, README.md:72)")
    ap.add_argument("--cache", choices=("stacked", "layered"),
                    default=None,
                    help="talker KV cache layout (layered = per-layer "
                         "buffers, avoids XLA slice-copy of the stacked "
                         "[L,...] array; default = QWEN3_TTS_CACHE env "
                         "or stacked)")
    ap.add_argument("--talker", choices=("auto", "xla", "fused"),
                    default=None,
                    help="talker decode-step impl (fused = the 28-layer "
                         "Pallas megakernel, ops/talker_fused.py; default "
                         "= QWEN3_TTS_TALKER env or auto, which currently "
                         "resolves to xla pending the on-chip A/B)")
    ap.add_argument("--ladder", type=str, default=None,
                    help="comma-separated B:kv:cache[:talker] entries "
                         "measured in ONE process (weights+backend init "
                         "paid once), e.g. "
                         "192:int8:layered,192:int8:stacked:fused. One "
                         "JSON line per entry, printed as each completes "
                         "(an OOM at a later rung keeps earlier lines). "
                         "Overrides --batch/--kv/--cache/--talker.")
    ap.add_argument("--voc-sub", type=int, default=None,
                    help="vocoder decode sub-batch width (default: the "
                         "bf16-era voc_sub_for table; int8-KV configs "
                         "have HBM room for wider subs — measure)")
    ap.add_argument("--chunks", type=int, default=3,
                    help="measured generation chunks per run (>=1)")
    ap.add_argument("--runs", type=int, default=3,
                    help="repeat the measured section; report the median "
                         "(tunnel variance is +-20%%)")
    ap.add_argument("--max-frames", type=int, default=400)
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--compile-retries", type=int, default=3,
                    help="retries for Pallas-embedding compiles (the axon "
                         "remote-compile helpers 500 on ~40%% of Pallas "
                         "compiles; a retry usually succeeds)")
    ap.add_argument("--check-fused", action="store_true",
                    help="numerically compare the fused vocoder against "
                         "the XLA chain at the bench shape (costs one "
                         "extra vocoder compile)")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke mode: tiny model dims (CPU-runnable CI "
                         "check of the bench flow; numbers meaningless)")
    args = ap.parse_args()
    if args.chunks < 1:
        ap.error("--chunks must be >= 1")

    entries: list[tuple[int, str, str | None, str | None]] = []
    if args.ladder:
        for spec in args.ladder.split(","):
            parts = spec.strip().split(":")
            if len(parts) not in (3, 4) or parts[1] not in ("int8", "bf16") \
                    or parts[2] not in ("stacked", "layered") \
                    or (len(parts) == 4
                        and parts[3] not in ("auto", "xla", "fused")):
                ap.error(f"bad --ladder entry {spec!r} (want "
                         "B:int8|bf16:stacked|layered[:auto|xla|fused])")
            entries.append((int(parts[0]), parts[1], parts[2],
                            parts[3] if len(parts) == 4 else args.talker))
    else:
        entries.append((args.batch, args.kv, args.cache, args.talker))

    import os

    # Backend-init watchdog: when the axon tunnel is unhealthy,
    # jax.devices() hangs indefinitely (observed: a multi-hour relay
    # outage where every probe blocked at PJRT init). Fail fast with a
    # machine-readable error instead of wedging the driver.
    import threading
    init_done = threading.Event()
    # covers backend init AND the on-device weight init (the cold-cache
    # weight-init compile alone is ~400 s through the tunnel)
    watchdog_s = float(os.environ.get("QWEN3_TTS_BENCH_INIT_TIMEOUT", "900"))

    def _watchdog():
        if not init_done.wait(watchdog_s):
            print(json.dumps({
                "metric": "bench_error", "value": 0, "unit": "none",
                "vs_baseline": 0,
                "error": f"TPU backend init exceeded {watchdog_s:.0f}s "
                         "(axon tunnel down?)"}), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # honor JAX_PLATFORMS=cpu (the image's sitecustomize pre-imports jax
    # with the axon platform, so the env var alone is too late — the
    # --tiny CPU smoke would otherwise hang on the dead tunnel)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: repeat bench runs skip the 20-100s compiles
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    jax.devices()          # force PJRT init under the watchdog

    from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig
    from qwen3_tts_tpu.models import vocoder
    from qwen3_tts_tpu.models.weights import init_talker_weights_device
    from qwen3_tts_tpu.runtime.aot import AotCache

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    if args.tiny:
        import dataclasses

        from qwen3_tts_tpu.models.weights import tiny_talker_config
        cfg = tiny_talker_config()
        vcfg = dataclasses.replace(vocoder.tiny_vocoder_config(),
                                   codebook_size=2048)
    else:
        cfg = TalkerConfig()
        vcfg = VocoderConfig()
    aot = AotCache()

    t0 = time.monotonic()
    # ON-DEVICE init: one tiny jitted program (fast_fill hash generator),
    # AOT-cached to disk. Host init + device_put was measured at 1105 s
    # (the axon tunnel uploads at ~1.3 MB/s); the threefry on-device init
    # fixed that but its 23 MiB executable still cost 60-530 s on first
    # dispatch through the tunnel (VERDICT r4 'next' #6, BENCH_r04's
    # 531 s) — fast_fill's program is ~KBs and executes in milliseconds.
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg,
                                   aot_cache=aot)
    # fence via a pure transfer of a small whole leaf: no eager op, so
    # no remote compile can hide inside the init timing
    jax.device_get(w["output_norm"])
    log(f"0.6B talker+code-pred weights initialized on device "
        f"({time.monotonic()-t0:.1f}s)")
    init_done.set()        # watchdog disarms after the first real device op

    t0 = time.monotonic()
    if args.tiny:
        vw = vocoder.init_vocoder_weights(np.random.default_rng(1), vcfg)
        vw = vocoder.cast_weights(jax.device_put(vw))  # bf16 fast path
    else:
        vw = vocoder.init_vocoder_weights_device(vcfg, aot_cache=aot)
    jax.device_get(jax.tree.leaves(vw)[0])
    log(f"vocoder weights initialized on device "
        f"({time.monotonic()-t0:.1f}s)")

    for i, (B, kv, cache, tk) in enumerate(entries):
        if len(entries) > 1:
            log(f"--- ladder entry {i+1}/{len(entries)}: "
                f"B={B} kv={kv} cache={cache} talker={tk} ---")
        rec = measure_entry(B=B, kv=kv, cache=cache, talker_impl=tk,
                            args=args, cfg=cfg,
                            w=w, vcfg=vcfg, vw=vw, aot=aot, jax=jax,
                            jnp=jnp, np=np)
        print(json.dumps(rec), flush=True)
        # drop this entry's device state before the next rung: leftover
        # KV/activation buffers from rung k would OOM rung k+1 at B=256+
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
