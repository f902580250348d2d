#!/usr/bin/env python3
"""Per-stage breakdown of the generation step on TPU.

Times, at full 0.6B scale and serving batch B:
  - talker decode step alone (28 layers)
  - code predictor alone (2-token prefill + 14 AR steps)
  - CB0 sampling alone
  - next-step embedding gather alone
  - full fused chunk (reference composition)

Usage: python tools/bench_breakdown.py [--batch 16] [--iters 40]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--kv", choices=("bf16", "int8"), default="bf16",
                    help="talker KV cache dtype (bench.py --kv)")
    ap.add_argument("--cache", choices=("stacked", "layered"),
                    default="stacked",
                    help="talker KV cache layout (bench.py --cache)")
    args = ap.parse_args()

    import jax
    # honor JAX_PLATFORMS=cpu (sitecustomize pre-imports jax with the
    # axon platform; the env var alone is too late to avoid the tunnel)
    import os as _os
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models import code_predictor, talker
    from qwen3_tts_tpu.models.weights import init_talker_weights_device
    from qwen3_tts_tpu.ops.sampling import sample_cb0
    from qwen3_tts_tpu.runtime.generate import (
        ctx_bucket, generate_chunk, init_state, make_consts, required_ctx)

    def sync(x):
        # Fetch ONE element, not the whole leaf: device_get of a full KV
        # cache (~2.8 GB at B=48) through the axon tunnel takes minutes and
        # swamps the measurement.
        leaf = jax.tree.leaves(x)[-1]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    B = args.batch
    N = args.iters
    cfg = TalkerConfig()
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)
    sync(w)
    rng = np.random.default_rng(0)

    tokens = jnp.asarray(rng.integers(0, 1000, (B, 48)), jnp.int32)
    lens = jnp.full((B,), 48, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    ctx = required_ctx(prefill.prefill_embd.shape[1], 400, 40)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(1),
                       kv_quant=args.kv == "int8",
                       kv_layered=args.cache == "layered")
    consts = make_consts(prefill, 0.9, 1.05)
    sync(state.logits)

    def timeit(name, fn, *a, **kw):
        out = fn(*a, **kw)
        sync(out)
        t0 = time.monotonic()
        for _ in range(N):
            out = fn(*a, **kw)
        sync(out)
        ms = (time.monotonic() - t0) / N * 1e3
        log(f"{name:<28} {ms:8.3f} ms/iter")
        return ms

    hidden = state.last_hidden
    cb0 = jnp.asarray(rng.integers(0, 2048, (B,)), jnp.int32)
    key = jax.random.PRNGKey(2)
    n_past = state.n_past

    # NOTE: each timed fn is independently jitted; state not donated so the
    # same buffers can be reused across iterations. Weights are passed as
    # traced ARGUMENTS (not closed over) so they lower to HLO parameters —
    # closing over them bakes ~1.2 GB of constants into the HLO upload,
    # which the axon remote-compile tunnel rejects (HTTP 413).
    # donate the cache: without donation every call materializes a second
    # full KV buffer (3.8 GB at B=64) — oversubscribing HBM and spilling,
    # which once measured 340 ms/iter for a ~10 ms step
    # production lockstep semantics: scalar write_idx + bucketed read
    # window. Omitting write_idx selects the per-stream scatter variant,
    # which on the kv-major layout rewrites the whole cache per layer —
    # it measures ~340 ms/iter at B=64 and is not used by any production
    # path (lock-step passes write_idx; ring serving passes write_slot).
    rc = ctx_bucket(int(np.asarray(state.n_past).max()) + 1, 40, ctx)
    talker_jit = jax.jit(
        lambda w_, h, kv, n: talker.talker_step(
            w_, cfg, h, kv, n, read_ctx=rc, write_idx=n[0]),
        donate_argnums=(2,))
    kv = state.kv_cache

    def talker_call(w_, h, n):
        nonlocal kv
        h2, lg, kv = talker_jit(w_, h, kv, n)
        return lg
    t_talker = timeit("talker_step (28L)", talker_call, w, hidden, n_past)

    cp_jit = jax.jit(lambda w_, h, c, t, key: code_predictor.predict_codes(
        w_, cfg, h, c, t, top_k=50, key=key))
    t_cp = timeit("code_predictor (16 codes)", cp_jit, w, hidden, cb0,
                  jnp.float32(0.9), key)

    samp_jit = jax.jit(partial(sample_cb0, top_k=50, eos_id=cfg.codec_eos_id,
                               suppress_start=2048))
    t_s = timeit("sample_cb0", samp_jit, state.logits, state.seen_mask,
                 state.frame_idx, consts.expected_frames,
                 jnp.float32(1.05), jnp.float32(0.9), key=key)

    codes16 = jnp.asarray(rng.integers(0, 2048, (B, 16)), jnp.int32)
    emb_jit = jax.jit(lambda w_, c, p: code_predictor.frame_step_embedding(
        w_, cfg, c, p))
    t_e = timeit("frame_step_embedding", emb_jit, w, codes16,
                 consts.tts_pad_embed)

    log(f"{'sum of stages':<28} {t_talker + t_cp + t_s + t_e:8.3f} ms/frame")

    # fused chunk for comparison (production path: donated state,
    # lockstep scalar write, bucketed read window — exactly bench.py's)
    state = state._replace(kv_cache=kv)

    def run_chunk(st):
        rc = ctx_bucket(int(np.asarray(st.n_past).max()), 40, ctx)
        return generate_chunk(w, cfg, st, consts, 50, 40,
                              read_ctx=rc, lockstep=True)
    t0 = time.monotonic()
    state2, codes, valid = run_chunk(state)
    sync(codes)
    log(f"fused chunk compile+run: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    for _ in range(3):
        state2, codes, valid = run_chunk(state2)
    sync(codes)
    log(f"{'fused chunk (per frame)':<28} "
        f"{(time.monotonic()-t0)/3/40*1e3:8.3f} ms/frame")


if __name__ == "__main__":
    main()
