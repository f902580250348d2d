#!/usr/bin/env python3
"""Where does the code predictor's time go? (round-3 megakernel scoping)

The 16-step code predictor costs ~7.7 ms/frame at B=64 (NOTES.md round 2)
against a ~3.1 ms weight-read floor (16 steps x 157 MB of bf16 layer
weights / ~800 GB/s HBM). Before writing a Pallas megakernel, isolate
what the 4.6 ms gap is made of:

  full       predict_codes (production, sampled)
  greedy     predict_codes greedy (drops top-k/softmax/CDF per step)
  matmul     the bare matmul chain at identical weight bytes/shapes —
             no norms/rope/attention/sampling/gathers (bandwidth
             skeleton: what XLA can do when ONLY the weight streams
             matter)
  nohead     matmul skeleton without the lm_head matmul (floor check)

Each variant runs inside a lax.scan over `--frames` iterations, jitted
once, so per-dispatch tunnel overhead (1-200 ms!) cannot distort the
per-frame numbers (same methodology as tools/bench_attention.py).

Usage: python tools/bench_codepred.py [--batch 64] [--frames 8] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8,
                    help="frames per jitted scan")
    ap.add_argument("--iters", type=int, default=5,
                    help="timed repetitions (median reported)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models import code_predictor
    from qwen3_tts_tpu.models.weights import init_talker_weights_device

    cfg = TalkerConfig()
    B = args.batch
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)
    cp = w["code_pred"]

    def sync(x):
        jax.device_get(jax.tree.leaves(x)[-1].ravel()[:1])

    hidden = jnp.zeros((B, cfg.hidden_size), jnp.float32) + 0.01
    cb0 = jnp.zeros((B,), jnp.int32)

    # -- full / greedy: the production function, scanned over frames ----
    @partial(jax.jit, static_argnames=("greedy",))
    def run_frames(w, hidden, cb0, key, greedy):
        def frame(carry, _):
            hidden, cb0, key = carry
            key, sub = jax.random.split(key)
            codes = code_predictor.predict_codes(
                w, cfg, hidden, cb0, jnp.float32(0.9), 50, sub,
                greedy=greedy)
            # feed something data-dependent back so nothing is DCE'd
            return (hidden + codes.sum() * 1e-9, cb0, key), None
        (h, _, _), _ = jax.lax.scan(frame, (hidden, cb0, key), None,
                                    length=args.frames)
        return h

    # -- matmul skeleton: identical weight bytes, nothing else ----------
    L = cfg.code_pred_layers
    n_steps = cfg.n_codebooks - 1

    @jax.jit
    def run_matmul(w, hidden, with_head=True):
        cp = w["code_pred"]

        def frame(carry, _):
            x = carry

            def step(x, s):
                for l in range(L):
                    wl = jax.tree.map(lambda a: a[l], cp["layers"])
                    qkv = jnp.dot(x.astype(wl["wqkv"].dtype), wl["wqkv"],
                                  preferred_element_type=jnp.float32)
                    a = jnp.dot(qkv[:, :2048].astype(wl["wo"].dtype),
                                wl["wo"], preferred_element_type=jnp.float32)
                    x = x + a * 1e-3
                    gu = jnp.dot(x.astype(wl["w_gu"].dtype), wl["w_gu"],
                                 preferred_element_type=jnp.float32)
                    gate, up = jnp.split(gu, 2, axis=-1)
                    act = (jax.nn.silu(gate) * up).astype(wl["w_down"].dtype)
                    x = x + jnp.dot(act, wl["w_down"],
                                    preferred_element_type=jnp.float32) * 1e-3
                if with_head:
                    head = jax.lax.dynamic_index_in_dim(cp["heads"], s,
                                                        keepdims=False)
                    logits = jnp.dot(x.astype(head.dtype), head,
                                     preferred_element_type=jnp.float32)
                    x = x + logits.max(-1, keepdims=True) * 1e-9
                return x, None

            x, _ = jax.lax.scan(step, x, jnp.arange(n_steps, dtype=jnp.int32))
            return x, None

        x, _ = jax.lax.scan(frame, hidden, None, length=args.frames)
        return x

    run_nohead = jax.jit(lambda w, h: run_matmul.__wrapped__(w, h, False))

    def bench(name, fn, *a, **k):
        out = fn(*a, **k)
        sync(out)  # compile
        ts = []
        for _ in range(args.iters):
            t0 = time.monotonic()
            out = fn(*a, **k)
            sync(out)
            ts.append((time.monotonic() - t0) * 1e3 / args.frames)
        med = sorted(ts)[len(ts) // 2]
        log(f"{name:>8}: {med:6.2f} ms/frame at B={B} "
            f"({', '.join(f'{t:.2f}' for t in ts)})")
        return med

    key = jax.random.PRNGKey(1)
    full = bench("full", run_frames, w, hidden, cb0, key, False)
    greedy = bench("greedy", run_frames, w, hidden, cb0, key, True)
    mm = bench("matmul", run_matmul, w, hidden)
    nh = bench("nohead", run_nohead, w, hidden)

    log(f"\nsampling (full-greedy):        {full-greedy:6.2f} ms/frame")
    log(f"attn/norm/rope/gather (greedy-matmul): {greedy-mm:6.2f} ms/frame")
    log(f"lm_head cost (matmul-nohead):  {mm-nh:6.2f} ms/frame")
    log(f"matmul chain vs ~3.1 ms floor: {mm:6.2f} ms/frame")


if __name__ == "__main__":
    main()
