#!/usr/bin/env python3
"""Diagnose/verify bench startup time (VERDICT r4 'next' #6: 531 s
between the 1.1 s AOT winit load and the first measurement; target
<= 60 s warm to first measurement).

Phases timed separately (each with its own fence):
  1. PJRT backend init (jax.devices())
  2. talker weight init — fast_fill on-device program (AOT-cached)
  3. vocoder weight init — on-device program (AOT-cached)

Run on the TPU: timeout 900 python -u tools/probe_init.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def log(msg: str) -> None:
    print(f"[probe +{time.monotonic()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.monotonic()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t = time.monotonic()
devs = jax.devices()
log(f"jax.devices() = {devs} ({time.monotonic()-t:.1f}s)")

from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig  # noqa: E402
from qwen3_tts_tpu.models import vocoder  # noqa: E402
from qwen3_tts_tpu.models.weights import (  # noqa: E402
    init_talker_weights_device)
from qwen3_tts_tpu.runtime.aot import AotCache  # noqa: E402

cfg = TalkerConfig()
aot = AotCache()

t = time.monotonic()
w = init_talker_weights_device(jax.random.PRNGKey(0), cfg, aot_cache=aot)
jax.device_get(w["output_norm"])
log(f"talker weights on device + fence: {time.monotonic()-t:.1f}s")

t = time.monotonic()
vw = vocoder.init_vocoder_weights_device(VocoderConfig(), aot_cache=aot)
jax.device_get(jax.tree.leaves(vw)[0])
log(f"vocoder weights on device + fence: {time.monotonic()-t:.1f}s")

log("total init")
