#!/usr/bin/env python3
"""Per-stage timing of the vocoder decode at serving shape.

Builds cumulative partial pipelines (front -> stage k) and diffs
successive timings, so each stage's cost includes exactly its own work.

Usage: python tools/bench_vocoder_stages.py [--batch 48] [--frames 40]
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
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--serving-batch", type=int, default=192,
                    help="batch for the subbatched-decode A/B section "
                         "(0 disables)")
    ap.add_argument("--serving-sub", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims: CPU-runnable flow check only")
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

    from qwen3_tts_tpu.config import VocoderConfig
    from qwen3_tts_tpu.models import vocoder
    from qwen3_tts_tpu.models.vocoder import (
        _decoder_block, _pre_tfm_layer, _upsample_block, causal_conv1d,
        cast_weights, snake, vq_dequantize)

    B, F = args.batch, args.frames
    if args.tiny:
        import dataclasses
        cfg = dataclasses.replace(vocoder.tiny_vocoder_config(),
                                  codebook_size=2048)
    else:
        cfg = VocoderConfig()
    rng = np.random.default_rng(0)
    w = cast_weights(jax.device_put(vocoder.init_vocoder_weights(rng, cfg)))
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (B, F, 16)),
                        jnp.int32)

    def front(w, codes, n_dec_blocks, with_final):
        x = vq_dequantize(w, cfg, codes)
        x = causal_conv1d(x, w["pre_conv_w"], w["pre_conv_b"])
        t = w["pre_tfm"]
        x = jnp.dot(x.astype(t["in_w"].dtype), t["in_w"],
                    preferred_element_type=jnp.float32) + t["in_b"]
        positions = jnp.broadcast_to(
            jnp.arange(F, dtype=jnp.int32)[None], (B, F))

        def layer(carry, wl):
            return _pre_tfm_layer(wl, carry, positions, cfg.n_heads,
                                  cfg.rms_norm_eps, cfg.rope_theta), None
        x, _ = jax.lax.scan(layer, x.astype(jnp.float32), t["layers"])
        from qwen3_tts_tpu.ops.layers import rms_norm
        x = rms_norm(x, t["norm"], cfg.rms_norm_eps)
        x = jnp.dot(x.astype(t["out_w"].dtype), t["out_w"],
                    preferred_element_type=jnp.float32) + t["out_b"]
        for up_w in w["upsample"]:
            x = _upsample_block(up_w, x)
        x = causal_conv1d(x, w["dec0_w"], w["dec0_b"])
        for blk_w, rate in list(zip(w["dec_blocks"],
                                    cfg.upsample_rates))[:n_dec_blocks]:
            x = _decoder_block(blk_w, x, rate, "causal")
        if with_final:
            x = snake(x, w["dec5_a"], w["dec5_b"])
            x = causal_conv1d(x, w["dec6_w"], w["dec6_b"])
            x = jnp.tanh(x[..., 0])
        return x

    def timeit(name, fn):
        f = jax.jit(fn)
        out = f(w, codes)
        jax.device_get(out.ravel()[0])
        t0 = time.monotonic()
        for _ in range(args.reps):
            out = f(w, codes)
        jax.device_get(out.ravel()[0])
        ms = (time.monotonic() - t0) / args.reps * 1e3
        log(f"{name:<38} {ms:9.2f} ms/chunk  shape={tuple(out.shape)}")
        return ms

    prev = timeit("front (vq+pretfm+upsample+dec0)",
                  lambda w, c: front(w, c, 0, False))
    names = [f"+ dec block {i+1} (rate {r})"
             for i, r in enumerate(cfg.upsample_rates)]
    for i, name in enumerate(names):
        cur = timeit(name, lambda w, c, n=i + 1: front(w, c, n, False))
        log(f"  -> stage cost {cur - prev:9.2f} ms")
        prev = cur
    cur = timeit("+ final snake/conv/tanh",
                 lambda w, c: front(w, c, len(cfg.upsample_rates), True))
    log(f"  -> stage cost {cur - prev:9.2f} ms")
    log(f"per frame: {cur / F:.3f} ms (B={B})")

    # ------------------------------------------------------------------
    # Subbatched-decode A/B at serving scale: front-once (production,
    # vocoder_decode_subbatched runs vq+pretfm+upsample+dec0 over the
    # WHOLE batch, lax.map only over the decoder tail) vs the round-3
    # layout that mapped the ENTIRE pipeline per sub-batch (emulated
    # here), which repeated the skinny front ops B/sub sequential times.
    if args.serving_batch:
        from qwen3_tts_tpu.models.vocoder import (_decode_impl,
                                                  _front_impl, _tail_impl)
        SB, sub = args.serving_batch, args.serving_sub
        codes_sb = jnp.asarray(
            rng.integers(0, cfg.codebook_size, (SB, F, 16)), jnp.int32)
        log(f"--- subbatched decode A/B: B={SB} sub={sub} F={F} ---")

        def timeit_sb(name, fn):
            f = jax.jit(fn)
            out = f(w, codes_sb)
            jax.device_get(out.ravel()[0])
            t0 = time.monotonic()
            for _ in range(args.reps):
                out = f(w, codes_sb)
            jax.device_get(out.ravel()[0])
            ms = (time.monotonic() - t0) / args.reps * 1e3
            log(f"{name:<38} {ms:9.2f} ms/chunk "
                f"({ms / F:.3f} ms/frame at B={SB})")
            return ms

        def whole_pipeline_mapped(w, c):       # round-3 layout
            groups = c.reshape(SB // sub, sub, F, 16)
            out = jax.lax.map(
                lambda g: _decode_impl(w, cfg, g, "causal", False), groups)
            return out.reshape(SB, out.shape[-1])

        def front_once(w, c):                  # production layout
            return vocoder.vocoder_decode_subbatched(
                w, cfg, c, trim="causal", sub=sub)

        def front_only_whole(w, c):
            return _front_impl(w, cfg, c)

        def front_only_mapped(w, c):
            groups = c.reshape(SB // sub, sub, F, 16)
            return jax.lax.map(lambda g: _front_impl(w, cfg, g), groups)

        timeit_sb("front only, whole-batch", front_only_whole)
        timeit_sb("front only, mapped per sub", front_only_mapped)
        t_new = timeit_sb("e2e front-once (production)", front_once)
        t_old = timeit_sb("e2e whole-pipeline-mapped (r3)",
                          whole_pipeline_mapped)
        log(f"front-once speedup: {t_old / t_new:.2f}x")


if __name__ == "__main__":
    main()
