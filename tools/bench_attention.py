#!/usr/bin/env python3
"""A/B the Pallas flash-decode kernel vs the XLA einsum decode attention
on the real chip, at serving dims.

Covers the three serving regimes:
  - prefix mode (lock-step batches): n_valid prefix per stream
  - ring bitmask mode, no window (reads all covered blocks)
  - ring bitmask mode with per-stream lifetime windows (block skipping)

Usage: python tools/bench_attention.py [--iters 50]
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
    ap.add_argument("--iters", type=int, default=50)
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

    from qwen3_tts_tpu.ops.flash_decode import flash_decode, \
        flash_decode_masked
    from qwen3_tts_tpu.ops.layers import (gqa_attention_step,
                                          gqa_attention_step_masked)

    def sync(x):
        jax.device_get(jax.tree.leaves(x)[-1])

    L = 28  # talker layers: run the attention L times inside ONE jit via
    # lax.scan, so per-call tunnel dispatch overhead doesn't drown the
    # kernel (the real usage is inside generate_chunk's compiled scan).

    def scanned(fn):
        @jax.jit
        def run(q, *args):
            def body(carry, _):
                out = fn(carry, *args)
                # feed a bit of the output back so scan iterations can't
                # be collapsed
                nq = carry + 1e-6 * out.reshape(carry.shape[0], -1)[
                    :, :carry.shape[1] * carry.shape[2]].reshape(carry.shape
                                                                 ).astype(carry.dtype)
                return nq, None
            final, _ = jax.lax.scan(body, q, None, length=L)
            return final
        return run

    def timeit(fn, n):
        fn()  # compile + warm
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n * 1e3 / L

    n_heads, n_kv, D = 16, 8, 128
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0].device_kind}")

    for B, S, nv in [(16, 512, 300), (48, 512, 300), (48, 512, 500),
                     (48, 1152, 300), (48, 1152, 1100), (64, 1152, 600)]:
        q = jnp.asarray(rng.standard_normal((B, n_heads, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, n_kv, D)), jnp.bfloat16)
        n_valid = jnp.full((B,), nv, jnp.int32)

        r_xla = scanned(lambda qq, kk, vv, nvv:
                        gqa_attention_step(qq, kk, vv, nvv))
        r_fl = scanned(lambda qq, kk, vv, nvv:
                       flash_decode(qq, kk, vv, nvv, read_ctx=S))
        t_xla = timeit(lambda: r_xla(q, k, v, n_valid), args.iters)
        t_fl = timeit(lambda: r_fl(q, k, v, n_valid), args.iters)
        log(f"prefix  B={B:3d} S={S:5d} nv={nv:5d}: "
            f"xla {t_xla:7.3f} ms/layer  flash {t_fl:7.3f} ms/layer  "
            f"(x{t_xla/t_fl:.2f}; per-frame x28: {t_fl*28:.1f} ms)")

        # ring: each stream alive `alive` steps, staggered admissions
        alive = nv
        P = 16
        lo = np.asarray((P + rng.integers(0, max(S - P - alive, 1), B))
                        .astype(np.int32))
        hi = int(min(lo.max() + alive, S))
        mask = np.zeros((B, S), bool)
        for b in range(B):
            mask[b, :10] = True
            mask[b, lo[b]:min(lo[b] + alive, S)] = True
        mask_j = jnp.asarray(mask)
        lo_j = jnp.asarray(lo)

        r_xm = scanned(lambda qq, kk, vv, mm:
                       gqa_attention_step_masked(qq, kk, vv, mm))
        r_fm = scanned(lambda qq, kk, vv, mm:
                       flash_decode_masked(qq, kk, vv, mm, read_ctx=S))
        r_fw = scanned(lambda qq, kk, vv, mm, ll:
                       flash_decode_masked(qq, kk, vv, mm, window_lo=ll,
                                           window_hi=jnp.int32(hi),
                                           prefill_len=P, read_ctx=S))
        t_xm = timeit(lambda: r_xm(q, k, v, mask_j), args.iters)
        t_fm = timeit(lambda: r_fm(q, k, v, mask_j), args.iters)
        t_fw = timeit(lambda: r_fw(q, k, v, mask_j, lo_j), args.iters)
        log(f"ring    B={B:3d} S={S:5d} alive={alive:4d}: "
            f"xla {t_xm:7.3f}  flash {t_fm:7.3f}  flash+win {t_fw:7.3f} "
            f"ms/layer (win x{t_xm/t_fw:.2f})")


if __name__ == "__main__":
    main()
