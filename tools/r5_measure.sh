#!/bin/bash
# Round-5 measurement runbook — the REMAINING queue (supersedes
# tools/r4_measure.sh; decisions 1-2 already landed, NOTES.md round 5):
#   DONE  startup fix        531 s init -> 15 s (fast_fill + on-device
#                            vocoder init, commit 1ff8359)
#   DONE  1. ablate          stacked == layered at int8/rc=128 (19.37 vs
#                            19.28 ms/frame); stacked stays the default
#   DONE  2. ladder          int8 KV wins: B=192 e2e 37.39 -> 31.08
#                            ms/frame (494x); B=256 realtime at 48%
#                            margin; bench.py --kv default flipped
# Remaining (order = decision value per TPU-minute):
#   3t. talker kernel        compiled-Mosaic parity at B=32 (numerics
#                            are B-independent; the bare-jit B=192 step
#                            compile died twice in the remote-compile
#                            service) + e2e fused-vs-xla ladder at
#                            B=192 via bench.py (the AOT path compiles
#                            these programs reliably) -> decides
#                            talker._AUTO_FUSED
#   3.  codepred parity      compiled-Mosaic vs XLA on chip (kernel is
#                            default-on under auto; VERDICT r4 next #3)
#   3v. vocoder parity       compiled fused res-chain + convT head
#   4.  vocfront             front-once vs whole-pipeline-mapped A/B
#   5.  flash                measure-or-demote, final call (VERDICT #7)
#   6.  voc-sub widening     int8 freed ~5.6 GB of HBM; try 32-wide at
#                            B=192 and 16-wide at B=256
#   7.  B=320 probe          capacity ceiling with int8
#   8.  serve                aggregate + TTFA p50/p99 at the winning
#                            config, 96 + 160 slots
#
# Strictly ONE TPU process at a time (overlap serializes on the chip and
# invalidates both measurements — NOTES.md round 2; re-confirmed round 5
# when an overlapped init read 602 s).
set -x
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('TPU OK', float((x@x).sum()))" || return 1
}

probe || { echo "TPU tunnel down; aborting"; exit 1; }

# 3t. talker megakernel: numerics at a shape whose bare-jit compiles
# survive the remote-compile service, then the e2e decision at B=192
# through bench.py's AOT-cached compile path.
timeout 1800 python -u tools/bench_talker_fused.py --batch 32 --kv int8 \
    --ctx 512 --read-ctx 512 --parity 2>&1 | tee /tmp/r5_tkparity32.log
timeout 5400 python -u bench.py --ladder \
    192:int8:stacked:xla,192:int8:stacked:fused \
    2>&1 | tee /tmp/r5_tk_e2e_ab.log

# 3. compiled-Mosaic parity for the default-on kernels
timeout 1800 python -u tools/bench_codepred.py --parity \
    2>&1 | tee /tmp/r5_cpparity.log
timeout 1800 python -u tools/bench_vocoder_fused.py --batch 48 --parity \
    2>&1 | tee /tmp/r5_vocparity.log

# 4. vocoder front restructure A/B (front-once vs r3 whole-pipeline map)
timeout 2400 python -u tools/bench_vocoder_stages.py --batch 48 \
    --serving-batch 192 --serving-sub 16 2>&1 | tee /tmp/r5_vocstages.log

# 5. flash-decode vs XLA at ring shapes (measure-or-demote, final call)
timeout 2400 python -u tools/bench_attention.py --iters 50 \
    2>&1 | tee /tmp/r5_attn.log

# 6+7. voc-sub widening + capacity probe (separate processes so an OOM
# can't take out earlier rungs)
timeout 2400 python -u bench.py --batch 192 --voc-sub 32 \
    2>&1 | tee /tmp/r5_vocsub32.log
timeout 2400 python -u bench.py --batch 256 --voc-sub 16 \
    2>&1 | tee /tmp/r5_b256_sub16.log
timeout 2400 python -u bench.py --batch 320 \
    2>&1 | tee /tmp/r5_b320.log

# 8. serving aggregate + TTFA at the winning lock-step config (add
# --talker fused IF 3t won end-to-end)
timeout 3600 python -u tools/bench_serve.py --slots 96 --requests 288 \
    --kv int8 2>&1 | tee /tmp/r5_serve96.log
timeout 3600 python -u tools/bench_serve.py --slots 160 --requests 480 \
    --kv int8 2>&1 | tee /tmp/r5_serve160.log

echo "ALL DONE — flip defaults per the data (talker._AUTO_FUSED, voc_sub_for,"
echo "bench_serve --kv default), update NOTES.md round 5 + README, commit logs."
