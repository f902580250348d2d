#!/usr/bin/env python3
"""A/B the talker decode-step megakernel (ops/talker_fused.py) against
the XLA stack_step on the real chip, at serving shapes.

Runs the step L_REPS times inside ONE jit (scan feeding a slice of the
output back) so per-dispatch tunnel overhead doesn't drown the kernel —
the real usage is inside generate_chunk's compiled scan.

--parity: compiled-Mosaic numerics vs the XLA path at the bench shape
(the interpret-mode tests cover CPU; this is the on-chip gate for
flipping QWEN3_TTS_TALKER=auto to the kernel).

Usage: python tools/bench_talker_fused.py [--batch 192] [--kv int8]
           [--read-ctx 512] [--iters 20] [--parity]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--kv", choices=("bf16", "int8"), default="int8")
    ap.add_argument("--read-ctx", type=int, default=512)
    ap.add_argument("--ctx", type=int, default=1152,
                    help="padded cache length S (serving ring size)")
    ap.add_argument("--iters", type=int, default=20,
                    help="steps per timed jit (scan length)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--compile-retries", type=int, default=3)
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
    from qwen3_tts_tpu.models.stack import (QuantKV, init_kv_cache,
                                            quantize_kv_rows, stack_step)
    from qwen3_tts_tpu.models.weights import init_talker_weights_device
    from qwen3_tts_tpu.ops import talker_fused

    cfg = TalkerConfig()
    B, S, rc = args.batch, args.ctx, args.read_ctx
    quant = args.kv == "int8"

    t0 = time.monotonic()
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)
    lw = w["layers"]
    jax.device_get(jax.tree.leaves(lw)[0].ravel()[:1])
    log(f"weights on device ({time.monotonic()-t0:.1f}s)")

    ok = talker_fused.supported(
        cfg, B, w, init_kv_cache(cfg.n_layers, 1, 128,
                                 cfg.n_key_value_heads, cfg.head_dim,
                                 quant=quant), jnp.int32(0), None, 128)
    log(f"supported(geometry/weights): {ok}")

    # random-but-plausible cache (both impls read identical rows), built
    # ONE LAYER AT A TIME inside jit: materializing the full
    # [L,2,B,kv,S,D] f32 tensor at serving shapes is ~47 GB and OOMs the
    # 16 GB HBM (observed on the first real-chip run); the per-layer
    # transient is ~1.7 GB and the fori_loop DUS updates in place.
    key = jax.random.PRNGKey(1)
    shape_l = (1, 2, B, cfg.n_key_value_heads, S, cfg.head_dim)
    n_elems = cfg.n_layers * int(np.prod(shape_l[1:]))
    cache_gb = n_elems * (1.25 if quant else 2) / 2**30
    log(f"cache {'int8' if quant else 'bf16'} ~{cache_gb:.1f} GB")

    if quant:
        @jax.jit
        def build():
            q0 = jnp.zeros((cfg.n_layers,) + shape_l[1:], jnp.int8)
            s0 = jnp.zeros((cfg.n_layers,) + shape_l[1:-1], jnp.float32)
            def body(l, acc):
                q_acc, s_acc = acc
                vals = jax.random.normal(jax.random.fold_in(key, l),
                                         shape_l, jnp.float32) * 0.5
                q, s = quantize_kv_rows(vals)
                return (jax.lax.dynamic_update_slice(
                            q_acc, q, (l, 0, 0, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            s_acc, s, (l, 0, 0, 0, 0)))
            return jax.lax.fori_loop(0, cfg.n_layers, body, (q0, s0))
        cache = QuantKV(*build())
    else:
        @jax.jit
        def build():
            c0 = jnp.zeros((cfg.n_layers,) + shape_l[1:], jnp.bfloat16)
            def body(l, c):
                vals = jax.random.normal(jax.random.fold_in(key, l),
                                         shape_l, jnp.float32) * 0.5
                return jax.lax.dynamic_update_slice(
                    c, vals.astype(jnp.bfloat16), (l, 0, 0, 0, 0, 0))
            return jax.lax.fori_loop(0, cfg.n_layers, body, c0)
        cache = build()
    x0 = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.hidden_size),
                           jnp.float32)
    widx = jnp.int32(rc - 8)
    positions = jnp.full((B,), rc - 8, jnp.int32)
    n_valid = positions + 1
    kw = dict(n_heads=cfg.n_attention_heads, n_kv=cfg.n_key_value_heads,
              head_dim=cfg.head_dim, eps=cfg.rms_norm_eps,
              theta=cfg.rope_theta, read_ctx=rc)

    def chain(step_fn):
        @jax.jit
        def run(x, cache):
            def body(carry, _):
                xc, cc = carry
                y, cc = step_fn(xc, cc)
                # feed output back so scan iterations can't collapse;
                # normalize so the chain can't blow up over iters
                xn = y / jnp.maximum(
                    jnp.sqrt(jnp.mean(y * y, axis=1, keepdims=True)), 1e-3)
                return (xn, cc), None
            (xo, co), _ = jax.lax.scan(body, (x, cache), None,
                                       length=args.iters)
            return xo, co
        return run

    def xla_step(x, c):
        return stack_step(lw, x, positions, c, widx, n_valid, **kw)

    def fused_step(x, c):
        return talker_fused.talker_step_fused(
            lw, x, positions, c, widx, n_valid, **kw)

    def sync(t):
        jax.device_get(jax.tree.leaves(t)[0].ravel()[:1])

    def timeit(name, fn, x, cache):
        for attempt in range(args.compile_retries):
            try:
                out = fn(x, cache)
                sync(out)
                break
            except Exception as e:
                if attempt == args.compile_retries - 1:
                    raise
                log(f"{name} compile attempt {attempt+1} failed: "
                    f"{type(e).__name__}: {str(e)[:200]}")
                time.sleep(2.0)
        best = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            out = fn(x, cache)
            sync(out)
            best.append((time.monotonic() - t0) / args.iters * 1e3)
        ms = float(np.median(best))
        log(f"{name:<28} {ms:8.3f} ms/step (B={B}, rc={rc}, {args.kv})")
        return ms, out

    def with_retries(fn, *a):
        """The axon remote-compile helper drops ~40% of requests with
        transient HTTP 500 / broken-pipe errors (NOTES.md round 2); a
        retry nearly always succeeds. Applied to every first (compiling)
        call in this tool, not just the timed section."""
        for attempt in range(args.compile_retries):
            try:
                return fn(*a)
            except Exception as e:
                if attempt == args.compile_retries - 1:
                    raise
                log(f"compile attempt {attempt+1} failed: "
                    f"{type(e).__name__}: {str(e)[:200]}")
                time.sleep(2.0)

    if args.parity:
        # jit both sides: the eager stack_step materializes per-layer
        # slice copies of the multi-GB cache op-by-op and OOMs at
        # serving shapes (observed on the first real-chip run)
        y_x, c_x = with_retries(jax.jit(xla_step), x0, cache)
        y_x.block_until_ready()
        del c_x   # drop the updated-cache copy before the second call:
        # two extra multi-GB cache buffers alive at once OOM the chip
        y_f, c_f = with_retries(jax.jit(fused_step), x0, cache)
        y_f.block_until_ready()
        del c_f
        a, b = np.asarray(y_x), np.asarray(y_f)
        scale = np.abs(a).max()
        rel = np.abs(a - b).max() / max(scale, 1e-9)
        log(f"parity: max|y_xla|={scale:.3f} relative-max-diff={rel:.2e}")
        verdict = "PASS" if rel < 1e-2 else "FAIL"
        log(f"compiled-Mosaic parity: {verdict}")
        import json
        print(json.dumps({"metric": "talker_fused_parity_reldiff",
                          "value": float(rel), "unit": "rel",
                          "vs_baseline": 1.0,
                          "pass": bool(rel < 1e-2)}))
        if verdict == "FAIL":
            sys.exit(1)

    ms_x, _ = timeit("xla stack_step", chain(xla_step), x0, cache)
    ms_f, _ = timeit("fused megakernel", chain(fused_step), x0, cache)
    log(f"speedup: {ms_x / ms_f:.2f}x")
    import json
    print(json.dumps({
        "metric": f"talker_step_ms_b{B}_rc{rc}_{args.kv}",
        "value": round(ms_f, 3), "unit": "ms",
        "vs_baseline": round(ms_x / ms_f, 2),
        "xla_ms": round(ms_x, 3)}))


if __name__ == "__main__":
    main()
