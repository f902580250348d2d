#!/usr/bin/env python3
"""Per-layer cost of the PRODUCTION decode attention
(ops/layers.gqa_attention_step_kvmajor) on the kv-major cache, bf16 vs
int8, at serving shapes — slope-style: the attention runs 28x inside one
jitted lax.scan (like the unrolled decode step), so per-call tunnel
dispatch does not pollute the number.

Reports effective HBM bandwidth vs the cache-read bytes; if the int8
path's time matches bf16 instead of halving, XLA is materializing the
int8->bf16 convert instead of fusing it into the dot.

Usage: python tools/bench_attention_kvmajor.py [--iters 30]
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
    ap.add_argument("--iters", type=int, default=30)
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

    from qwen3_tts_tpu.models.stack import quantize_kv_rows
    from qwen3_tts_tpu.ops.layers import gqa_attention_step_kvmajor

    def sync(x):
        leaf = jax.tree.leaves(x)[-1]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    L = 28

    def scanned(fn):
        @jax.jit
        def run(q, *args):
            def body(carry, _):
                out = fn(carry, *args)
                nq = carry + 1e-6 * out.reshape(
                    carry.shape[0], carry.shape[1], carry.shape[2]
                ).astype(carry.dtype)
                return nq, None
            final, _ = jax.lax.scan(body, q, None, length=L)
            return final
        return run

    def timeit(fn, n):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n * 1e3 / L

    n_heads, n_kv, D = 16, 8, 128
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0].device_kind}")

    for B, S, nv in [(96, 256, 200), (192, 256, 200), (192, 512, 400),
                     (224, 256, 200)]:
        q = jnp.asarray(rng.standard_normal((B, n_heads, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, n_kv, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, n_kv, S, D)), jnp.bfloat16)
        n_valid = jnp.full((B,), nv, jnp.int32)
        mask = jnp.arange(S)[None, :] < n_valid[:, None]
        kq, ks = quantize_kv_rows(k)
        vq, vs = quantize_kv_rows(v)

        def head(qq):
            return qq.reshape(B, n_heads, D)

        r_bf = scanned(lambda qq, kk, vv, mm:
                       gqa_attention_step_kvmajor(head(qq), kk, vv, mm)
                       .reshape(B, n_heads, D))
        r_i8 = scanned(lambda qq, kk, vv, mm, kss, vss:
                       gqa_attention_step_kvmajor(head(qq), kk, vv, mm,
                                                  k_scale=kss, v_scale=vss)
                       .reshape(B, n_heads, D))
        t_bf = timeit(lambda: r_bf(q, k, v, mask), args.iters)
        t_i8 = timeit(lambda: r_i8(q, kq, vq, mask, ks, vs), args.iters)

        bytes_bf = B * n_kv * S * D * 2 * 2
        bytes_i8 = B * n_kv * S * D * 2 * 1 + B * n_kv * S * 2 * 4
        log(f"B={B:3d} S={S:4d}: bf16 {t_bf:7.3f} ms/layer "
            f"({bytes_bf / t_bf / 1e6:6.0f} GB/s)   "
            f"int8 {t_i8:7.3f} ms/layer "
            f"({bytes_i8 / t_i8 / 1e6:6.0f} GB/s)   "
            f"per-frame x28: bf16 {t_bf * 28:5.1f} / int8 {t_i8 * 28:5.1f} ms")


if __name__ == "__main__":
    main()
