#!/usr/bin/env python3
"""A/B the fused residual-chain Pallas kernel vs the XLA chain at the
vocoder's serving shapes (see tools/bench_vocoder_stages.py for the
stage-level breakdown that motivated this kernel).

--parity additionally asserts the COMPILED fused kernels (res chain and
the snake+convT head) match the XLA chain on hardware — tests cover
interpret mode only; the compiled Mosaic path (f32-slice relayouts, VMEM
halo scratch across grid programs, reversed-grid convT halo) is checked
here at serving shapes.

Usage: python tools/bench_vocoder_fused.py [--batch 48] [--reps 10]
       [--parity]
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
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--parity", action="store_true",
                    help="assert compiled fused outputs match the XLA chain")
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

    from qwen3_tts_tpu.models.vocoder import _residual_block
    from qwen3_tts_tpu.ops.vocoder_fused import fused_residual_chain

    B = args.batch
    # (T, C) per decoder block's residual chain at 40-frame chunks
    shapes = [(1280, 768), (6400, 384), (25600, 192), (76800, 96)]
    rng = np.random.default_rng(0)

    def mk_res(c):
        return {
            "a1": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "b1": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "c1_w": jnp.asarray(rng.standard_normal((c, c, 7)) * 0.05,
                                jnp.bfloat16),
            "c1_b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "a2": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "b2": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
            "c2_w": jnp.asarray(rng.standard_normal((c, c, 1)) * 0.05,
                                jnp.bfloat16),
            "c2_b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        }

    def xla_chain(x, res):
        for rw, d in zip(res, (1, 3, 9)):
            x = _residual_block(rw, x, d)
        return x

    failures = 0
    for T, C in shapes:
        res = [mk_res(C) for _ in range(3)]
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32))
        # ideal: chain reads+writes each row once; f32 in/out
        sol_ms = 2 * B * T * C * 4 / 800e9 * 1e3
        outs = {}
        for name, fn in (("xla", xla_chain),
                         ("fused", fused_residual_chain)):
            f = jax.jit(lambda x, r, fn=fn: fn(x, r))
            try:
                # retry the first (compiling) call: the axon remote
                # compile helper drops ~40% of requests transiently
                # (HTTP 500 / broken pipe, NOTES.md) — without a retry
                # a flake records a spurious FAILED for the variant
                for attempt in range(3):
                    try:
                        out = f(x, res)
                        break
                    except Exception as e:
                        if attempt == 2:
                            raise
                        log(f"  compile retry ({type(e).__name__}: "
                            f"{str(e)[:120]})")
                        time.sleep(2.0)
                jax.device_get(out.ravel()[0])
                t0 = time.monotonic()
                for _ in range(args.reps):
                    out = f(x, res)
                jax.device_get(out.ravel()[0])
                ms = (time.monotonic() - t0) / args.reps * 1e3
                log(f"B={B} T={T:6d} C={C:4d}  {name:>6}: {ms:8.2f} ms "
                    f"(sol {sol_ms:.1f} ms)")
                if args.parity:
                    outs[name] = np.asarray(jax.device_get(out), np.float32)
            except Exception as e:
                log(f"B={B} T={T:6d} C={C:4d}  {name:>6}: FAILED {e!r}")
        if args.parity and len(outs) == 2:
            ref, got = outs["xla"], outs["fused"]
            denom = np.maximum(np.abs(ref).max(), 1e-6)
            rel = np.abs(got - ref).max() / denom
            ok = rel < 2e-2 and np.isfinite(got).all()
            log(f"  parity res-chain T={T} C={C}: max rel diff "
                f"{rel:.2e} {'OK' if ok else '** MISMATCH **'}")
            failures += 0 if ok else 1

    if args.parity:
        # snake+convT head parity: compiled fused_snake_convt vs the XLA
        # snake -> conv_transpose1d -> causal trim -> +bias chain at each
        # decoder block's serving shape (dec0 out 1536ch; rates 8,5,4,3).
        from qwen3_tts_tpu.models.vocoder import conv_transpose1d, snake
        from qwen3_tts_tpu.ops.vocoder_fused import fused_snake_convt
        head_shapes = [(160, 1536, 8), (1280, 768, 5),
                       (6400, 384, 4), (25600, 192, 3)]
        for T, C, rate in head_shapes:
            C2, K = C // 2, 2 * rate
            a = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
            b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
            w = jnp.asarray(rng.standard_normal((C, C2, K)) * 0.05,
                            jnp.bfloat16)
            bias = jnp.asarray(rng.standard_normal(C2) * 0.1, jnp.float32)
            x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)

            def xla_head(x, a=a, b=b, w=w, bias=bias, rate=rate, K=K):
                y = snake(x, a, b)
                y = conv_transpose1d(y, w, rate)
                return y[:, K - rate:] + bias

            def _retry(fn, *fa):
                for attempt in range(3):
                    try:
                        return fn(*fa)
                    except Exception as e:
                        if attempt == 2:
                            raise
                        log(f"  compile retry ({type(e).__name__}: "
                            f"{str(e)[:120]})")
                        time.sleep(2.0)

            try:
                ref = np.asarray(jax.device_get(
                    _retry(jax.jit(xla_head), x)), np.float32)
                got = np.asarray(jax.device_get(_retry(jax.jit(
                    lambda x: fused_snake_convt(x, a, b, w, bias, rate)),
                    x)), np.float32)
            except Exception as e:
                log(f"  parity head T={T} C={C} r={rate}: FAILED {e!r}")
                failures += 1
                continue
            denom = np.maximum(np.abs(ref).max(), 1e-6)
            rel = np.abs(got - ref).max() / denom
            ok = (got.shape == ref.shape and rel < 2e-2
                  and np.isfinite(got).all())
            log(f"  parity head T={T} C={C} r={rate}: max rel diff "
                f"{rel:.2e} {'OK' if ok else '** MISMATCH **'}")
            failures += 0 if ok else 1
        if failures:
            log(f"PARITY: {failures} mismatch(es)")
            sys.exit(1)
        log("PARITY: all compiled fused outputs match the XLA chain")


if __name__ == "__main__":
    main()
