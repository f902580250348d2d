#!/usr/bin/env python3
"""In-scan per-stage decomposition of the generation loop.

bench_breakdown.py times each stage as a standalone dispatch, which through
the axon tunnel is dominated by ~1-30 ms of per-call overhead. Here every
stage runs INSIDE a lax.scan over `chunk` iterations (exactly like the
production generate_chunk), so the number is the marginal per-frame device
cost of that stage.

Usage: python tools/bench_scan_stages.py [--batch 48] [--ctx 512] [--chunk 40]
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
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
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
        GenState, generate_chunk, init_state, make_consts)

    B, CTX, CH = args.batch, args.ctx, args.chunk
    cfg = TalkerConfig()
    w = init_talker_weights_device(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    tokens = jnp.asarray(rng.integers(0, 1000, (B, 48)), jnp.int32)
    lens = jnp.full((B,), 48, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    state = init_state(w, cfg, prefill, CTX, jax.random.PRNGKey(1))
    consts = make_consts(prefill, 0.9, 1.05)
    jax.device_get(state.n_past[:1])

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    def bench(name, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.monotonic()
        for _ in range(args.reps):
            out = fn(*a)
        sync(out)
        ms = (time.monotonic() - t0) / args.reps / CH * 1e3
        log(f"{name:<34} {ms:8.3f} ms/frame (in-scan)")
        return ms

    hidden0 = state.last_hidden
    logits0 = state.logits
    kv0 = state.kv_cache
    n0 = state.n_past

    # --- talker step only ---------------------------------------------
    @jax.jit
    def talker_only(w_, h, kv, n):
        def step(carry, _):
            h, kv, n = carry
            # lockstep scalar write slot, like generate_chunk(lockstep=True)
            h2, logits, kv = talker.talker_step(w_, cfg, h, kv, n,
                                                read_ctx=CTX,
                                                write_idx=jnp.max(n))
            return (h2, kv, n + 1), logits[0, 0]
        (h, kv, n), out = jax.lax.scan(step, (h, kv, n), None, length=CH)
        return h, out

    t_talker = bench("talker_step (28L, lockstep)", talker_only,
                     w, hidden0, kv0, n0)

    # --- code predictor only ------------------------------------------
    cb0 = jnp.asarray(rng.integers(0, 2048, (B,)), jnp.int32)

    @jax.jit
    def cp_only(w_, h, c):
        def step(carry, _):
            h, c = carry
            rest = code_predictor.predict_codes(
                w_, cfg, h, c, jnp.float32(0.9), 50,
                jax.random.PRNGKey(3))
            # feed a data-dependent next input so scan can't hoist
            return (h + rest[:, :1].astype(h.dtype) * 1e-9,
                    rest[:, 0] % 2048), rest[0, 0]
        (h, c), out = jax.lax.scan(step, (h, c), None, length=CH)
        return h, out

    t_cp = bench("code_predictor (16 codes)", cp_only, w, hidden0, cb0)

    # --- sampling only -------------------------------------------------
    @jax.jit
    def samp_only(logits, seen, fi, exp):
        def step(carry, _):
            logits, seen = carry
            ids = sample_cb0(logits, seen, fi, exp, jnp.float32(1.05),
                             jnp.float32(0.9), 50, jax.random.PRNGKey(5),
                             eos_id=cfg.codec_eos_id, suppress_start=2048)
            seen = seen.at[jnp.arange(B), jnp.clip(ids, 0, 2047)].set(True)
            return (logits + ids[:, None] * 1e-9, seen), ids[0]
        carry, out = jax.lax.scan(step, (logits, seen), None, length=CH)
        return carry[0], out

    t_s = bench("sample_cb0", samp_only, logits0, state.seen_mask,
                state.frame_idx, consts.expected_frames)

    # --- frame embedding only ------------------------------------------
    codes16 = jnp.asarray(rng.integers(0, 2048, (B, 16)), jnp.int32)

    @jax.jit
    def emb_only(w_, codes, pad):
        def step(carry, _):
            codes = carry
            e = code_predictor.frame_step_embedding(w_, cfg, codes, pad)
            return (codes + 1) % 2048, e[0, 0]
        carry, out = jax.lax.scan(step, codes, None, length=CH)
        return carry, out

    t_e = bench("frame_step_embedding", emb_only, w, codes16,
                consts.tts_pad_embed)

    log(f"{'sum of stages':<34} {t_talker + t_cp + t_s + t_e:8.3f} ms/frame")

    # --- full fused chunk ----------------------------------------------
    st = state
    st, codes, valid = generate_chunk(w, cfg, st, consts, 50, CH,
                                      read_ctx=CTX, lockstep=True)
    sync(codes)
    t0 = time.monotonic()
    for _ in range(args.reps):
        st, codes, valid = generate_chunk(w, cfg, st, consts, 50, CH,
                                          read_ctx=CTX, lockstep=True)
    sync(codes)
    log(f"{'full generate_chunk':<34} "
        f"{(time.monotonic() - t0) / args.reps / CH * 1e3:8.3f} ms/frame")


if __name__ == "__main__":
    main()
