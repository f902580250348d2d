#!/bin/bash
# Round-3 measurement runbook: run when the TPU tunnel is healthy.
# Strictly one-at-a-time (two TPU processes serialize on the one chip and
# invalidate both measurements — NOTES.md round 2).
#
# Produces /tmp/r3_*.log; review in order:
#  1. ablate   — layered-vs-stacked production stack_step A/B (full vs
#                full-lyr lines decide the QWEN3_TTS_CACHE default)
#  2. ladder   — lock-step bench at the candidate configs (real int8 now)
#  3. parity   — compiled fused vocoder + codepred kernels vs XLA on chip
#  4. serve    — serving aggregate at the best config
set -x
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('TPU OK', float((x@x).sum()))" || return 1
}

probe || { echo "TPU tunnel down; aborting"; exit 1; }

# 1. ablation: the decisive variants only (full stacked vs layered vs
# the two per-layer hypotheses); add --only '' for the full 13-variant
# attribution if time allows
timeout 2400 python -u tools/bench_talker_ablate.py --batch 192 --iters 20 \
    --only full,full-lyr,listcache,snapshot 2>&1 | tee /tmp/r3_ablate.log

# 2. lock-step ladder: layered x int8 at B=192/256 (+ stacked control)
timeout 2400 python -u bench.py --batch 192 --kv int8 --cache layered \
    2>&1 | tee /tmp/r3_b192_l8.log
timeout 2400 python -u bench.py --batch 256 --kv int8 --cache layered \
    2>&1 | tee /tmp/r3_b256_l8.log
timeout 2400 python -u bench.py --batch 192 --kv int8 --cache stacked \
    2>&1 | tee /tmp/r3_b192_s8.log
timeout 2400 python -u bench.py --batch 192 --kv bf16 --cache layered \
    2>&1 | tee /tmp/r3_b192_lb.log

# 3. on-chip parity of the compiled fused kernels
timeout 1800 python -u tools/bench_vocoder_fused.py --batch 48 --parity \
    2>&1 | tee /tmp/r3_vocparity.log
timeout 1800 python -u tools/bench_codepred.py --parity \
    2>&1 | tee /tmp/r3_cpparity.log

# 4. serving aggregate at the best lock-step config
timeout 3000 python -u tools/bench_serve.py --slots 96 --requests 288 \
    --kv int8 --cache layered 2>&1 | tee /tmp/r3_serve96.log

echo "ALL DONE — see /tmp/r3_*.log"
