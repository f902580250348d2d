#!/usr/bin/env python3
"""Where does the code predictor's time go? (megakernel A/B)

The 16-step code predictor runs against a ~3.2 ms/frame weight-read
floor (16 steps x ~158 MB of bf16 weights / ~800 GB/s HBM). Variants:

  full       predict_codes (production, sampled)
  greedy     predict_codes greedy (drops top-k/softmax/CDF per step)
  matmul     the bare matmul chain at identical weight bytes/shapes —
             no norms/rope/attention/sampling/gathers (bandwidth
             skeleton: what XLA can do when ONLY the weight streams
             matter)
  nohead     matmul skeleton without the lm_head matmul (floor check)

SLOPE TIMING (NOTES.md round 3): every host sync through the axon
tunnel costs ~28-36 ms of RTT, so total/frames at one frame count
carries a +RTT/frames bias (an 8-frame scan reads 7.9 ms/frame when the
truth is 4.3). Each variant is timed at TWO scan lengths (--frames and
5x --frames) and the reported per-frame cost is the slope
(t_long - t_short)/(F_long - F_short); the intercept (printed) is the
sync tax.

--impl {auto,xla,fused} selects the predict_codes implementation
(models/code_predictor.set_codepred_impl; fused = ops/codepred_fused).

Usage: python tools/bench_codepred.py [--batch 64] [--impl auto]
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
                    help="short scan length (long = 5x this)")
    ap.add_argument("--iters", type=int, default=5,
                    help="timed repetitions per length (median reported)")
    ap.add_argument("--impl", default="auto",
                    choices=("auto", "xla", "fused", "fused_interpret"))
    ap.add_argument("--parity", action="store_true",
                    help="compare the COMPILED fused kernel's greedy "
                         "codes against the XLA path on this backend "
                         "(tests cover interpret mode only; this is the "
                         "on-hardware Mosaic check)")
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
    from functools import partial

    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models import code_predictor
    from qwen3_tts_tpu.models.weights import init_talker_weights_device

    cfg = TalkerConfig()
    B = args.batch
    code_predictor.set_codepred_impl(args.impl)
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)

    def sync(x):
        jax.device_get(jax.tree.leaves(x)[-1].ravel()[:1])

    hidden = jnp.zeros((B, cfg.hidden_size), jnp.float32) + 0.01
    cb0 = jnp.zeros((B,), jnp.int32)

    if args.parity:
        from qwen3_tts_tpu.ops import codepred_fused as cf
        h = jax.random.normal(jax.random.PRNGKey(11),
                              (B, cfg.hidden_size), jnp.float32) * 0.5
        c0 = jax.random.randint(jax.random.PRNGKey(12), (B,), 0,
                                cfg.code_pred_vocab_size)
        def _retry(fn, *fa, **fk):
            # the axon remote-compile helper drops ~40% of requests
            # transiently (HTTP 500 / broken pipe, NOTES.md)
            for attempt in range(3):
                try:
                    return fn(*fa, **fk)
                except Exception as e:
                    if attempt == 2:
                        raise
                    log(f"parity compile retry ({type(e).__name__}: "
                        f"{str(e)[:120]})")
                    time.sleep(2.0)

        fused = np.asarray(_retry(
            cf.predict_codes_fused, w, cfg, h, c0, jnp.float32(0.0), 50,
            jax.random.PRNGKey(0), greedy=True))
        code_predictor.set_codepred_impl("xla")
        ref = np.asarray(_retry(
            code_predictor.predict_codes, w, cfg, h, c0, jnp.float32(0.0),
            50, jax.random.PRNGKey(0), greedy=True))
        code_predictor.set_codepred_impl(args.impl)
        agree = (fused == ref).mean()
        stream = (fused == ref).all(axis=1).mean()
        log(f"parity (compiled fused vs XLA, greedy, B={B}): "
            f"code agreement {agree:.4f}, exact streams {stream:.3f} "
            f"(boundary flips from bf16 tile-order rounding are "
            f"expected on random weights; see tests/test_codepred_fused)")
        assert agree >= 0.8, f"compiled fused kernel diverges: {agree}"

    # -- full / greedy: the production function, scanned over frames ----
    @partial(jax.jit, static_argnames=("greedy", "frames"))
    def run_frames(w, hidden, cb0, key, greedy, frames):
        def frame(carry, _):
            hidden, cb0, key = carry
            key, sub = jax.random.split(key)
            codes = code_predictor.predict_codes(
                w, cfg, hidden, cb0, jnp.float32(0.9), 50, sub,
                greedy=greedy)
            # feed something data-dependent back so nothing is DCE'd
            return (hidden + codes.sum() * 1e-9, cb0, key), None
        (h, _, _), _ = jax.lax.scan(frame, (hidden, cb0, key), None,
                                    length=frames)
        return h

    # -- matmul skeleton: identical weight bytes, nothing else ----------
    L = cfg.code_pred_layers
    n_steps = cfg.n_codebooks - 1

    @partial(jax.jit, static_argnames=("with_head", "frames"))
    def run_matmul(w, hidden, with_head, frames):
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

        x, _ = jax.lax.scan(frame, hidden, None, length=frames)
        return x

    F_SHORT, F_LONG = args.frames, args.frames * 5

    def bench(name, fn, *a):
        """Slope timing: median total at two scan lengths; per-frame =
        slope (cancels the ~30 ms tunnel sync tax, NOTES.md round 3)."""
        tot = {}
        for F in (F_SHORT, F_LONG):
            # retry the first (compiling) call: the axon remote-compile
            # helpers 500 on ~40% of Pallas compiles (NOTES.md)
            for attempt in range(3):
                try:
                    out = fn(*a, F)
                    sync(out)  # compile
                    break
                except Exception as e:
                    if attempt == 2:
                        raise
                    log(f"compile retry ({type(e).__name__}: "
                        f"{str(e)[:120]})")
                    time.sleep(2.0)
            ts = []
            for _ in range(args.iters):
                t0 = time.monotonic()
                out = fn(*a, F)
                sync(out)
                ts.append((time.monotonic() - t0) * 1e3)
            tot[F] = sorted(ts)[len(ts) // 2]
        slope = (tot[F_LONG] - tot[F_SHORT]) / (F_LONG - F_SHORT)
        tax = tot[F_SHORT] - F_SHORT * slope
        log(f"{name:>8}: {slope:6.2f} ms/frame at B={B} "
            f"(sync tax {tax:5.1f} ms; totals {tot[F_SHORT]:.1f}/"
            f"{tot[F_LONG]:.1f} ms at F={F_SHORT}/{F_LONG})")
        return slope

    key = jax.random.PRNGKey(1)
    full = bench("full",
                 lambda w_, h_, c_, k_, F: run_frames(
                     w_, h_, c_, k_, greedy=False, frames=F),
                 w, hidden, cb0, key)
    greedy = bench("greedy",
                   lambda w_, h_, c_, k_, F: run_frames(
                       w_, h_, c_, k_, greedy=True, frames=F),
                   w, hidden, cb0, key)
    mm = bench("matmul",
               lambda w_, h_, F: run_matmul(w_, h_, with_head=True,
                                            frames=F),
               w, hidden)
    nh = bench("nohead",
               lambda w_, h_, F: run_matmul(w_, h_, with_head=False,
                                            frames=F),
               w, hidden)

    log(f"\nsampling (full-greedy):        {full-greedy:6.2f} ms/frame")
    log(f"attn/norm/rope/gather (greedy-matmul): {greedy-mm:6.2f} ms/frame")
    log(f"lm_head cost (matmul-nohead):  {mm-nh:6.2f} ms/frame")
    log(f"matmul chain vs ~3.1 ms floor: {mm:6.2f} ms/frame")


if __name__ == "__main__":
    main()
