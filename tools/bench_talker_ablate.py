#!/usr/bin/env python3
"""Ablate the talker decode layer to find where the non-KV cost lives.

At B=192 / small read window, talker_step measures ~13.8 ms/frame while
its floors are ~1.1 ms (880 MB bf16 weights at ~800 GB/s) + ~1.2 ms
(230 GFLOP at MXU peak). This runs 28 copies of progressively richer
layer bodies inside ONE jitted lax.scan (so tunnel dispatch is excluded)
to attribute the gap:

  mm        four layer matmuls only (wqkv -> wo -> w_gu -> w_down)
  +norms    + rms_norm x4 (attn/ffn/q/k) and residual adds
  +rope     + NEOX rotary on q/k
  +attn     + kv-major decode attention over a read window (no write)
  +write    + the per-step DUS cache write (lockstep scalar slot)
  full      stack_step itself (the production body)

Usage: python tools/bench_talker_ablate.py [--batch 192] [--iters 30]
       [--kv bf16|int8] [--read-ctx 128]
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
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--kv", choices=("bf16", "int8"), default="int8")
    ap.add_argument("--read-ctx", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run (default "
                         "all): mm,norms,rope,attn,full,full-lyr,batched,"
                         "ds-read,candidate,listcache,read-only,"
                         "write-only,snapshot")
    args = ap.parse_args()
    only = (None if args.only is None
            else {v.strip() for v in args.only.split(",")})

    def want(name: str) -> bool:
        return only is None or name in only

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

    from qwen3_tts_tpu.models import stack
    from qwen3_tts_tpu.ops.attention import decode_attention
    from qwen3_tts_tpu.ops.layers import rms_norm, rope_neox

    def sync(x):
        leaf = jax.tree.leaves(x)[-1]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    B, S, RC = args.batch, args.ctx, args.read_ctx
    L = 28
    H, n_heads, n_kv, D, F = 1024, 16, 8, 128, 3072
    eps, theta = 1e-6, 1e6
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0].device_kind}  B={B} S={S} rc={RC} "
        f"kv={args.kv}")

    def mk(*shape, dtype=jnp.bfloat16, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    layers_w = {
        "attn_norm": jnp.ones((L, H), jnp.float32),
        "ffn_norm": jnp.ones((L, H), jnp.float32),
        "q_norm": jnp.ones((L, D), jnp.float32),
        "k_norm": jnp.ones((L, D), jnp.float32),
        "wqkv": mk(L, H, (n_heads + 2 * n_kv) * D),
        "wo": mk(L, n_heads * D, H),
        "w_gu": mk(L, H, 2 * F),
        "w_down": mk(L, F, H),
    }
    x0 = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    quant = args.kv == "int8"
    mk_cache = lambda: stack.init_kv_cache(L, B, S, n_kv, D, quant=quant)

    def mk_list():
        if quant:
            vals = [jnp.zeros((2, B, n_kv, S, D), jnp.int8)
                    for _ in range(L)]
            scls = [jnp.full((2, B, n_kv, S), 1e-8 / 127., jnp.float32)
                    for _ in range(L)]
        else:
            vals = [jnp.zeros((2, B, n_kv, S, D), jnp.bfloat16)
                    for _ in range(L)]
            scls = [None] * L
        return tuple(vals), tuple(scls)

    cache = mk_cache()
    n_valid = jnp.full((B,), RC - 8, jnp.int32)
    positions = n_valid[:, None]          # [B,1] for the ablation bodies
    write_idx = jnp.int32(RC - 8)

    nq, nk = n_heads * D, n_kv * D

    def mm_body(x, wl):
        xb = x.astype(jnp.bfloat16)
        qkv = jnp.dot(xb, wl["wqkv"], preferred_element_type=jnp.float32)
        attn_in = qkv[:, :nq]
        x = x + jnp.dot(attn_in.astype(jnp.bfloat16), wl["wo"],
                        preferred_element_type=jnp.float32)
        gu = jnp.dot(x.astype(jnp.bfloat16), wl["w_gu"],
                     preferred_element_type=jnp.float32)
        gate, up = gu[:, :F], gu[:, F:]
        act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
        return x + jnp.dot(act, wl["w_down"],
                           preferred_element_type=jnp.float32)

    def norms_body(x, wl, with_rope=False):
        h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
        qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
        q = qkv[:, :nq].reshape(B, 1, n_heads, D)
        k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
        q = rms_norm(q, wl["q_norm"], eps)
        k = rms_norm(k, wl["k_norm"], eps)
        if with_rope:
            q = rope_neox(q, positions, theta)
            k = rope_neox(k, positions, theta)
        attn_in = (q.reshape(B, nq) + jnp.mean(k) * 0).astype(jnp.bfloat16)
        x = x + jnp.dot(attn_in, wl["wo"], preferred_element_type=jnp.float32)
        h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
        gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
        gate, up = gu[:, :F], gu[:, F:]
        act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
        return x + jnp.dot(act, wl["w_down"],
                           preferred_element_type=jnp.float32)

    def attn_body(x, wl, kc, vc, ksc, vsc):
        h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
        qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
        q = qkv[:, :nq].reshape(B, 1, n_heads, D)
        k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
        v = qkv[:, nq + nk:].reshape(B, 1, n_kv, D)
        q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
        k = rope_neox(rms_norm(k, wl["k_norm"], eps), positions, theta)
        attn = decode_attention(q[:, 0].astype(jnp.bfloat16), kc, vc,
                                n_valid, read_ctx=RC,
                                k_scale=ksc, v_scale=vsc)
        x = x + jnp.dot(attn.astype(jnp.bfloat16), wl["wo"],
                        preferred_element_type=jnp.float32)
        h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
        gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
        gate, up = gu[:, :F], gu[:, F:]
        act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
        return x + jnp.dot(act, jnp.asarray(wl["w_down"]),
                           preferred_element_type=jnp.float32)

    def scanned(body, *extra):
        @jax.jit
        def run(x, layers_w, *extra):
            def f(carry, wl):
                return body(carry, wl, *extra), None
            y, _ = jax.lax.scan(f, x, layers_w)
            return y
        return lambda: run(x0, layers_w, *extra)

    def timeit(name, fn):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        log(f"{name:<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} us/layer)")
        return ms

    if want("mm"):
        timeit("mm", scanned(mm_body))
    if want("norms"):
        timeit("+norms", scanned(lambda x, wl: norms_body(x, wl, False)))
    if want("rope"):
        timeit("+rope", scanned(lambda x, wl: norms_body(x, wl, True)))

    if quant:
        kc, vc = cache.values[0, 0], cache.values[0, 1]
        ksc, vsc = cache.scales[0, 0], cache.scales[0, 1]
    else:
        kc, vc = cache[0, 0], cache[0, 1]
        ksc = vsc = None
    if want("attn"):
        timeit("+attn",
               scanned(lambda x, wl: attn_body(x, wl, kc, vc, ksc, vsc)))

    # full production body: unrolled stack_step (stacked [L,...] weights,
    # x [B,H], positions [B]) with donated cache, 4 frames per dispatch
    @partial(jax.jit, donate_argnums=(2,))
    def full(x, layers_w, cache):
        def f(carry, _):
            x, cache = carry
            y, cache = stack.stack_step(
                layers_w, x, n_valid, cache, write_idx,
                n_valid, n_heads=n_heads, n_kv=n_kv, head_dim=D,
                eps=eps, theta=theta, read_ctx=RC)
            return (y, cache), None
        (y, cache), _ = jax.lax.scan(f, (x, cache), None, length=4)
        return y, cache

    if want("full"):
        out, cache2 = full(x0, layers_w, mk_cache())
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, cache2 = full(x0, layers_w, cache2)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'full':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [stack_step x4 in-scan, incl. cache write]")
        del cache2

    # ---- full production body, LAYERED cache layout ---------------------
    # (QWEN3_TTS_CACHE=layered): same stack_step, tuple of per-layer
    # buffers — the production A/B for the listcache hypothesis below.
    @partial(jax.jit, donate_argnums=(2,))
    def full_layered(x, layers_w, lcache):
        def f(carry, _):
            x, lcache = carry
            y, lcache = stack.stack_step(
                layers_w, x, n_valid, lcache, write_idx,
                n_valid, n_heads=n_heads, n_kv=n_kv, head_dim=D,
                eps=eps, theta=theta, read_ctx=RC)
            return (y, lcache), None
        (y, lcache), _ = jax.lax.scan(f, (x, lcache), None, length=4)
        return y, lcache

    if want("full-lyr"):
        lcache = stack.init_kv_cache(L, B, S, n_kv, D, quant=quant,
                                     layered=True)
        out, lcache = full_layered(x0, layers_w, lcache)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, lcache = full_layered(x0, layers_w, lcache)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'full-lyr':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [stack_step x4 in-scan, layered cache]")
        del lcache

    # ---- redesign candidate: deferred batched cache write --------------
    # Unrolled layer loop; each layer's k/v row for the CURRENT token is
    # used in-register by attention (one extra score column) instead of
    # being DUS'd into the full cache first; all 28 layers' rows are
    # written in ONE dynamic_update_slice after the loop.
    def batched_step(layers_w, x, cache):
        from qwen3_tts_tpu.ops.attention import decode_attention as datt
        x = x.astype(jnp.float32)
        rows_k, rows_v = [], []
        quant_c = isinstance(cache, stack.QuantKV)
        for l in range(L):
            wl = jax.tree.map(lambda a: a[l], layers_w)
            h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
            qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :nq].reshape(B, 1, n_heads, D)
            k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
            v = qkv[:, nq + nk:].reshape(B, 1, n_kv, D)
            q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
            k = rope_neox(rms_norm(k, wl["k_norm"], eps), positions, theta)
            rows_k.append(k[:, 0])
            rows_v.append(v[:, 0])
            if quant_c:
                kc, vc = cache.values[l, 0], cache.values[l, 1]
                ksc, vsc = cache.scales[l, 0], cache.scales[l, 1]
            else:
                kc, vc = cache[l, 0], cache[l, 1]
                ksc = vsc = None
            past = datt(q[:, 0].astype(jnp.bfloat16), kc, vc, n_valid,
                        read_ctx=RC, k_scale=ksc, v_scale=vsc)
            # fold the current token in-register (approximation for the
            # timing probe: add it as one extra softmax column is the
            # production design; here past-only is the bandwidth shape)
            attn = past + 1e-6 * (q[:, 0] * k[:, 0, :1].repeat(
                n_heads // n_kv * 0 + 1, 1)).reshape(B, -1)[:, :1]
            x = x + jnp.dot(attn.reshape(B, nq).astype(jnp.bfloat16),
                            wl["wo"], preferred_element_type=jnp.float32)
            h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
            gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
            gate, up = gu[:, :F], gu[:, F:]
            act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
            x = x + jnp.dot(act, wl["w_down"],
                            preferred_element_type=jnp.float32)
        kall = jnp.stack(rows_k)                       # [L, B, kv, D]
        vall = jnp.stack(rows_v)
        kv = jnp.stack([kall, vall], 1)                # [L, 2, B, kv, D]
        kv = kv[:, :, :, :, None, :]                   # [L,2,B,kv,1,D]
        if quant_c:
            qv, qs = stack.quantize_kv_rows(kv)
            cache = stack.QuantKV(
                values=jax.lax.dynamic_update_slice(
                    cache.values, qv, (0, 0, 0, 0, write_idx, 0)),
                scales=jax.lax.dynamic_update_slice(
                    cache.scales, qs, (0, 0, 0, 0, write_idx)))
        else:
            cache = jax.lax.dynamic_update_slice(
                cache, kv.astype(cache.dtype), (0, 0, 0, 0, write_idx, 0))
        return x, cache

    @partial(jax.jit, donate_argnums=(2,))
    def full_batched(x, layers_w, cache):
        def f(carry, _):
            x, cache = carry
            return batched_step(layers_w, x, cache), None
        (y, cache), _ = jax.lax.scan(f, (x, cache), None, length=4)
        return y, cache

    if want("batched"):
        out, cache3 = full_batched(x0, layers_w, mk_cache())
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, cache3 = full_batched(x0, layers_w, cache3)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'batched':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [deferred single-DUS write]")
        del cache3

    # ---- E1: scanned layers, per-layer cache read via dynamic_slice ----
    from qwen3_tts_tpu.ops.attention import decode_attention as datt

    def attn_body_ds(x_l, wl, values, scales):
        x, l = x_l
        kvl = jax.lax.dynamic_slice_in_dim(values, l, 1, 0)[0]  # [2,B,kv,S,D]
        kc, vc = kvl[0], kvl[1]
        if scales is not None:
            ssl = jax.lax.dynamic_slice_in_dim(scales, l, 1, 0)[0]
            ksc, vsc = ssl[0], ssl[1]
        else:
            ksc = vsc = None
        h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
        qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
        q = qkv[:, :nq].reshape(B, 1, n_heads, D)
        k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
        v = qkv[:, nq + nk:].reshape(B, 1, n_kv, D)
        q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
        k = rope_neox(rms_norm(k, wl["k_norm"], eps), positions, theta)
        attn = datt(q[:, 0].astype(jnp.bfloat16), kc, vc, n_valid,
                    read_ctx=RC, k_scale=ksc, v_scale=vsc)
        x = x + jnp.dot(attn.astype(jnp.bfloat16), wl["wo"],
                        preferred_element_type=jnp.float32)
        h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
        gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
        act = (jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(jnp.bfloat16)
        x = x + jnp.dot(act, wl["w_down"], preferred_element_type=jnp.float32)
        return (x, l + 1), (k[:, 0], v[:, 0])

    def cache_arrays():
        c = mk_cache()
        return (c.values, c.scales) if quant else (c, None)

    @jax.jit
    def run_ds(x, layers_w, values, scales):
        def f(carry, wl):
            return attn_body_ds(carry, wl, values, scales)
        (y, _), _ = jax.lax.scan(f, (x, jnp.int32(0)), layers_w)
        return y

    if want("ds-read"):
        values_in, scales_in = cache_arrays()
        fn = lambda: run_ds(x0, layers_w, values_in, scales_in)
        timeit("ds-read", fn)

    # ---- E3: the candidate: scan + ds-read + ys rows + ONE DUS + the
    # cache carried across 4 frames (donated) -----------------------------
    @partial(jax.jit, donate_argnums=(2, 3) if quant else (2,))
    def run_candidate(x, layers_w, values, scales):
        def frame(carry, _):
            x, values, scales = carry
            def f(c, wl):
                return attn_body_ds(c, wl, values, scales)
            (y, _), (ks_r, vs_r) = jax.lax.scan(f, (x, jnp.int32(0)),
                                                layers_w)
            kv = jnp.stack([ks_r, vs_r], 1)[:, :, :, :, None, :]
            if scales is not None:
                qv, qs = stack.quantize_kv_rows(kv)
                values = jax.lax.dynamic_update_slice(
                    values, qv, (0, 0, 0, 0, write_idx, 0))
                scales = jax.lax.dynamic_update_slice(
                    scales, qs, (0, 0, 0, 0, write_idx))
            else:
                values = jax.lax.dynamic_update_slice(
                    values, kv.astype(values.dtype),
                    (0, 0, 0, 0, write_idx, 0))
            return (y, values, scales), None
        (y, values, scales), _ = jax.lax.scan(
            frame, (x, values, scales), None, length=4)
        return y, values, scales

    if want("candidate"):
        values_in, scales_in = cache_arrays()
        out, values_in, scales_in = run_candidate(x0, layers_w, values_in,
                                                  scales_in)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, values_in, scales_in = run_candidate(
                x0, layers_w, values_in, scales_in)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'candidate':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [scan + ds-read + ys rows + one DUS, "
            f"4-frame carry]")
        del values_in, scales_in

    # ---- E4: per-layer cache buffers (list of [2,B,kv,S,D] arrays) -----
    # Mirrors production stack_step semantics exactly (write the row via
    # in-place DUS on the layer's OWN donated buffer, then read it back
    # through decode_attention), but with no [L,...] super-buffer: the
    # hypothesis is that slicing layer l out of the stacked cache defeats
    # XLA's in-place/fusion analysis and materializes ~100 MB copies.

    def list_step(x, layers_w, vals, scls):
        vals, scls = list(vals), list(scls)
        x = x.astype(jnp.float32)
        for l in range(L):
            wl = jax.tree.map(lambda a: a[l], layers_w)
            h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
            qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :nq].reshape(B, 1, n_heads, D)
            k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
            v = qkv[:, nq + nk:].reshape(B, 1, n_kv, D)
            q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
            k = rope_neox(rms_norm(k, wl["k_norm"], eps), positions, theta)
            if quant:
                from qwen3_tts_tpu.models.stack import quantize_kv_rows
                k_row, k_s = quantize_kv_rows(k[:, 0])
                v_row, v_s = quantize_kv_rows(v[:, 0])
                new_kv = jnp.stack([k_row, v_row])[:, :, :, None, :]
                vals[l] = jax.lax.dynamic_update_slice(
                    vals[l], new_kv, (0, 0, 0, write_idx, 0))
                new_s = jnp.stack([k_s, v_s])[:, :, :, None]
                scls[l] = jax.lax.dynamic_update_slice(
                    scls[l], new_s, (0, 0, 0, write_idx))
                kc, vc = vals[l][0], vals[l][1]
                ksc, vsc = scls[l][0], scls[l][1]
            else:
                new_kv = jnp.stack([k[:, 0], v[:, 0]]).astype(
                    jnp.bfloat16)[:, :, :, None, :]
                vals[l] = jax.lax.dynamic_update_slice(
                    vals[l], new_kv, (0, 0, 0, write_idx, 0))
                kc, vc = vals[l][0], vals[l][1]
                ksc = vsc = None
            attn = decode_attention(q[:, 0].astype(jnp.bfloat16), kc, vc,
                                    n_valid, read_ctx=RC,
                                    k_scale=ksc, v_scale=vsc)
            x = x + jnp.dot(attn.astype(jnp.bfloat16), wl["wo"],
                            preferred_element_type=jnp.float32)
            h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
            gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
            act = (jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(jnp.bfloat16)
            x = x + jnp.dot(act, wl["w_down"],
                            preferred_element_type=jnp.float32)
        return x, vals, scls

    @partial(jax.jit, donate_argnums=(2, 3) if quant else (2,))
    def run_list(x, layers_w, vals, scls):
        def frame(carry, _):
            x, vals, scls = carry
            y, nv, ns = list_step(x, layers_w, vals, scls)
            return (y, tuple(nv), tuple(ns)), None
        (y, vals, scls), _ = jax.lax.scan(
            frame, (x, tuple(vals), tuple(scls)), None, length=4)
        return y, vals, scls

    if want("listcache"):
        list_vals, list_scales = mk_list()
        out, list_vals, list_scales = run_list(x0, layers_w, list_vals,
                                               list_scales)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, list_vals, list_scales = run_list(x0, layers_w, list_vals,
                                                   list_scales)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'listcache':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [per-layer buffers, in-place DUS, prod semantics]")
        del list_vals, list_scales

    # ---- E5: read-only over 28 DISTINCT per-layer buffers --------------
    # (+attn reads layer 0's slice 28 times, which XLA may hoist/reuse;
    # this variant reads a different buffer per layer, no writes)
    def ro_step(x, layers_w, vals, scls):
        x = x.astype(jnp.float32)
        for l in range(L):
            wl = jax.tree.map(lambda a: a[l], layers_w)
            h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
            qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :nq].reshape(B, 1, n_heads, D)
            q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
            if quant:
                kc, vc = vals[l][0], vals[l][1]
                ksc, vsc = scls[l][0], scls[l][1]
            else:
                kc, vc = vals[l][0], vals[l][1]
                ksc = vsc = None
            attn = decode_attention(q[:, 0].astype(jnp.bfloat16), kc, vc,
                                    n_valid, read_ctx=RC,
                                    k_scale=ksc, v_scale=vsc)
            x = x + jnp.dot(attn.astype(jnp.bfloat16), wl["wo"],
                            preferred_element_type=jnp.float32)
            h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
            gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
            act = (jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(jnp.bfloat16)
            x = x + jnp.dot(act, wl["w_down"],
                            preferred_element_type=jnp.float32)
        return x

    @jax.jit
    def run_ro(x, layers_w, vals, scls):
        def frame(carry, _):
            return ro_step(carry, layers_w, vals, scls), None
        y, _ = jax.lax.scan(frame, x, None, length=4)
        return y

    if want("read-only"):
        ro_vals, ro_scales = mk_list()
        fn = lambda: run_ro(x0, layers_w, ro_vals, ro_scales)
        timeit("read-only", fn)
        del ro_vals, ro_scales

    # ---- E6: write-only (quantize + DUS per layer, no cache read) ------
    def wo_step(x, layers_w, vals, scls):
        vals, scls = list(vals), list(scls)
        x = x.astype(jnp.float32)
        for l in range(L):
            wl = jax.tree.map(lambda a: a[l], layers_w)
            h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
            qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :nq].reshape(B, 1, n_heads, D)
            k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
            v = qkv[:, nq + nk:].reshape(B, 1, n_kv, D)
            q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
            k = rope_neox(rms_norm(k, wl["k_norm"], eps), positions, theta)
            if quant:
                from qwen3_tts_tpu.models.stack import quantize_kv_rows
                k_row, k_s = quantize_kv_rows(k[:, 0])
                v_row, v_s = quantize_kv_rows(v[:, 0])
                new_kv = jnp.stack([k_row, v_row])[:, :, :, None, :]
                vals[l] = jax.lax.dynamic_update_slice(
                    vals[l], new_kv, (0, 0, 0, write_idx, 0))
                new_s = jnp.stack([k_s, v_s])[:, :, :, None]
                scls[l] = jax.lax.dynamic_update_slice(
                    scls[l], new_s, (0, 0, 0, write_idx))
            else:
                new_kv = jnp.stack([k[:, 0], v[:, 0]]).astype(
                    jnp.bfloat16)[:, :, :, None, :]
                vals[l] = jax.lax.dynamic_update_slice(
                    vals[l], new_kv, (0, 0, 0, write_idx, 0))
            attn_in = (q.reshape(B, nq)
                       + jnp.mean(v) * 0).astype(jnp.bfloat16)
            x = x + jnp.dot(attn_in, wl["wo"],
                            preferred_element_type=jnp.float32)
            h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
            gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
            act = (jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(jnp.bfloat16)
            x = x + jnp.dot(act, wl["w_down"],
                            preferred_element_type=jnp.float32)
        return x, vals, scls

    @partial(jax.jit, donate_argnums=(2, 3) if quant else (2,))
    def run_wo(x, layers_w, vals, scls):
        def frame(carry, _):
            x, vals, scls = carry
            y, nv, ns = wo_step(x, layers_w, vals, scls)
            return (y, tuple(nv), tuple(ns)), None
        (y, vals, scls), _ = jax.lax.scan(
            frame, (x, tuple(vals), tuple(scls)), None, length=4)
        return y, vals, scls

    if want("write-only"):
        wo_vals, wo_scales = mk_list()
        out, wo_vals, wo_scales = run_wo(x0, layers_w, wo_vals, wo_scales)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, wo_vals, wo_scales = run_wo(x0, layers_w, wo_vals,
                                             wo_scales)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'write-only':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [quantize + per-layer DUS, no cache read]")
        del wo_vals, wo_scales

    # ---- E8: per-layer buffers, SNAPSHOT read + deferred write ----------
    # Attention reads the pre-write buffer (past entries only; the current
    # token's contribution is approximated by a cheap in-register term so
    # the data dependency survives DCE); each layer's new row is DUS'd
    # AFTER its read. Eliminates any read-after-pending-write copy the
    # in-place-then-read order (E4/production) might force.
    def snap_step(x, layers_w, vals, scls):
        vals, scls = list(vals), list(scls)
        x = x.astype(jnp.float32)
        for l in range(L):
            wl = jax.tree.map(lambda a: a[l], layers_w)
            h = rms_norm(x, wl["attn_norm"], eps).astype(jnp.bfloat16)
            qkv = jnp.dot(h, wl["wqkv"], preferred_element_type=jnp.float32)
            q = qkv[:, :nq].reshape(B, 1, n_heads, D)
            k = qkv[:, nq:nq + nk].reshape(B, 1, n_kv, D)
            v = qkv[:, nq + nk:].reshape(B, 1, n_kv, D)
            q = rope_neox(rms_norm(q, wl["q_norm"], eps), positions, theta)
            k = rope_neox(rms_norm(k, wl["k_norm"], eps), positions, theta)
            if quant:
                kc, vc = vals[l][0], vals[l][1]
                ksc, vsc = scls[l][0], scls[l][1]
            else:
                kc, vc = vals[l][0], vals[l][1]
                ksc = vsc = None
            past = decode_attention(q[:, 0].astype(jnp.bfloat16), kc, vc,
                                    n_valid, read_ctx=RC,
                                    k_scale=ksc, v_scale=vsc)
            # current-token correction term (timing stand-in for the extra
            # softmax column the production fused-frame design would use)
            cur = jnp.einsum("bhd,bkd->bh", q[:, 0], k[:, 0]) * 1e-9
            attn = past + cur.repeat(D, -1)[:, :nq] * 0 + cur.mean() * 0
            x = x + jnp.dot(attn.astype(jnp.bfloat16), wl["wo"],
                            preferred_element_type=jnp.float32)
            if quant:
                from qwen3_tts_tpu.models.stack import quantize_kv_rows
                k_row, k_s = quantize_kv_rows(k[:, 0])
                v_row, v_s = quantize_kv_rows(v[:, 0])
                vals[l] = jax.lax.dynamic_update_slice(
                    vals[l], jnp.stack([k_row, v_row])[:, :, :, None, :],
                    (0, 0, 0, write_idx, 0))
                scls[l] = jax.lax.dynamic_update_slice(
                    scls[l], jnp.stack([k_s, v_s])[:, :, :, None],
                    (0, 0, 0, write_idx))
            else:
                vals[l] = jax.lax.dynamic_update_slice(
                    vals[l], jnp.stack([k[:, 0], v[:, 0]]).astype(
                        jnp.bfloat16)[:, :, :, None, :],
                    (0, 0, 0, write_idx, 0))
            h2 = rms_norm(x, wl["ffn_norm"], eps).astype(jnp.bfloat16)
            gu = jnp.dot(h2, wl["w_gu"], preferred_element_type=jnp.float32)
            act = (jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(jnp.bfloat16)
            x = x + jnp.dot(act, wl["w_down"],
                            preferred_element_type=jnp.float32)
        return x, vals, scls

    @partial(jax.jit, donate_argnums=(2, 3) if quant else (2,))
    def run_snap(x, layers_w, vals, scls):
        def frame(carry, _):
            x, vals, scls = carry
            y, nv, ns = snap_step(x, layers_w, vals, scls)
            return (y, tuple(nv), tuple(ns)), None
        (y, vals, scls), _ = jax.lax.scan(
            frame, (x, tuple(vals), tuple(scls)), None, length=4)
        return y, vals, scls

    if want("snapshot"):
        sn_vals, sn_scales = mk_list()
        out, sn_vals, sn_scales = run_snap(x0, layers_w, sn_vals,
                                           sn_scales)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, sn_vals, sn_scales = run_snap(x0, layers_w, sn_vals,
                                               sn_scales)
        sync(out)
        ms = (time.perf_counter() - t0) / args.iters / 4 * 1e3
        log(f"{'snapshot':<10} {ms:8.3f} ms/frame ({ms / L * 1e3:6.1f} "
            f"us/layer) [per-layer, read-before-write + deferred DUS]")


if __name__ == "__main__":
    main()
