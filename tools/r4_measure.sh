#!/bin/bash
# Round-4 measurement runbook: run the moment the TPU tunnel is healthy.
# Supersedes tools/r3_measure.sh — same decisions, but the lock-step
# ladder now runs in ONE process (bench.py --ladder: weights + backend
# init paid once; the r3 logs burned 12-528 s of tunnel luck per config
# on the identical init program) and every executable is AOT-cached.
#
# Strictly one TPU process at a time (two processes serialize on the one
# chip and invalidate both measurements — NOTES.md round 2).
#
# Decisions this run makes (VERDICT r3 "next" #1/#2/#3/#7):
#  1. ablate   — layered-vs-stacked stack_step: flips the
#                QWEN3_TTS_CACHE default (runtime/generate.py) if
#                full-lyr wins
#  2. ladder   — real-int8 x layered lock-step at B=192/224/256(/320):
#                picks the bench.py --batch/--kv defaults + README row
#  3. parity   — compiled (Mosaic) fused vocoder + codepred kernels vs
#                XLA on chip: keeps 'auto' defaults only on a pass
#  4. vocfront — front-once vs whole-pipeline-mapped subbatched decode
#                (the round-4 restructure; VERDICT #4 target: front
#                <= 2 ms/chunk)
#  5. flash    — flash-decode vs XLA einsum at ring shapes: keep the
#                kernel's production dispatch only on a measured win,
#                else demote to tools/ (VERDICT #7)
#  6. serve    — serving aggregate + TTFA p50/p99 at the winning config
set -x
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('TPU OK', float((x@x).sum()))" || return 1
}

probe || { echo "TPU tunnel down; aborting"; exit 1; }

# 1. ablation: the decisive variants (stacked prod vs layered prod vs
# the per-layer hypotheses). ~6 configs, one process.
timeout 2400 python -u tools/bench_talker_ablate.py --batch 192 --iters 20 \
    --only full,full-lyr,listcache,snapshot 2>&1 | tee /tmp/r4_ablate.log

# 2. lock-step ladder, ONE process: real int8 x layered at the capacity
# rungs, plus the stacked and bf16 controls at B=192.
timeout 5400 python -u bench.py --ladder \
    192:int8:layered,192:int8:stacked,192:bf16:layered,224:int8:layered,256:int8:layered \
    2>&1 | tee /tmp/r4_ladder.log
# capacity probe past 256 only if 256 had margin (separate process so an
# OOM can't take out the recorded rungs above)
timeout 2400 python -u bench.py --batch 320 --kv int8 --cache layered \
    2>&1 | tee /tmp/r4_b320.log

# 3. on-chip parity of the compiled (Mosaic) fused kernels
timeout 1800 python -u tools/bench_vocoder_fused.py --batch 48 --parity \
    2>&1 | tee /tmp/r4_vocparity.log
timeout 1800 python -u tools/bench_codepred.py --parity \
    2>&1 | tee /tmp/r4_cpparity.log

# 3b. talker decode-step megakernel: compiled parity + step-level A/B
# vs the XLA stack_step (decides QWEN3_TTS_TALKER default), then an e2e
# rung at the bench level if the step A/B wins
timeout 2400 python -u tools/bench_talker_fused.py --batch 192 --kv int8 \
    --read-ctx 512 --parity 2>&1 | tee /tmp/r4_tkfused.log
timeout 2400 python -u bench.py --batch 192 --kv int8 --cache stacked \
    --talker fused 2>&1 | tee /tmp/r4_b192_s8_tkfused.log

# 4. vocoder front restructure A/B (front-once vs r3 whole-pipeline map)
timeout 2400 python -u tools/bench_vocoder_stages.py --batch 48 \
    --serving-batch 192 --serving-sub 16 2>&1 | tee /tmp/r4_vocstages.log

# 5. flash-decode vs XLA at ring shapes (measure-or-demote)
timeout 2400 python -u tools/bench_attention.py --iters 50 \
    2>&1 | tee /tmp/r4_attn.log

# 6. serving aggregate + TTFA at the winning lock-step config (edit
# --kv/--cache here if the ladder picked differently; add
# --talker fused for a serving rung IF step 3b won on chip — the
# kernel's ring-bitmask mode is interpret-verified)
timeout 3600 python -u tools/bench_serve.py --slots 96 --requests 288 \
    --kv int8 --cache layered 2>&1 | tee /tmp/r4_serve96.log
timeout 3600 python -u tools/bench_serve.py --slots 160 --requests 480 \
    --kv int8 --cache layered 2>&1 | tee /tmp/r4_serve160.log

echo "ALL DONE — see /tmp/r4_*.log; now flip defaults per the data and"
echo "update README/NOTES so no recorded number is labeled with a config"
echo "that didn't run."
