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
    args = ap.parse_args()

    import jax
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
    cfg = VocoderConfig()
    rng = np.random.default_rng(0)
    w = vocoder.init_vocoder_weights(rng, cfg) if cfg.hidden_dim else None
    # real dims init (init_vocoder_weights works for any config)
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


if __name__ == "__main__":
    main()
