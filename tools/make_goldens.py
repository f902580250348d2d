#!/usr/bin/env python3
"""Generate golden activation fixtures for numeric regression tests.

The reference's dev loop diffed dumped intermediate tensors against its
Python source of truth (SURVEY.md §4). Without weights in this image, we
freeze OUR OWN tiny-model activations (CPU, f32, fixed seeds) as goldens:
any future refactor that changes numerics unintentionally trips
tests/test_goldens.py.

Regenerate intentionally with: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"


def build_fixture():
    from qwen3_tts_tpu.models import code_predictor, talker, vocoder
    from qwen3_tts_tpu.models import speaker_encoder as spk
    from qwen3_tts_tpu.models.weights import (init_talker_weights,
                                              tiny_talker_config)
    from qwen3_tts_tpu.runtime.generate import (
        generate_chunk, init_state, make_consts, required_ctx)
    import dataclasses

    out = {}
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(2024), cfg)

    B = 2
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)),
                         jnp.int32)
    lens = jnp.full((B,), 16, jnp.int32)
    spk_emb = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)) * 0.05,
                          jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk_emb)
    out["prefill_embd"] = np.asarray(prefill.prefill_embd)
    out["trailing_hidden"] = np.asarray(prefill.trailing_hidden)

    ctx = required_ctx(prefill.prefill_embd.shape[1], 8, 8)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(3))
    out["prefill_logits"] = np.asarray(state.logits)
    out["prefill_hidden"] = np.asarray(state.last_hidden)

    consts = make_consts(prefill, 0.0, 1.05)
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, 8)
    out["greedy_codes"] = np.asarray(codes)
    out["greedy_valid"] = np.asarray(valid)

    cp = code_predictor.predict_codes(
        w, cfg, state.last_hidden, jnp.asarray([3, 99], jnp.int32),
        jnp.float32(0.0), 50, jax.random.PRNGKey(5))
    out["code_pred_codes"] = np.asarray(cp)

    vcfg = dataclasses.replace(vocoder.tiny_vocoder_config(),
                               codebook_size=2048)
    vw = vocoder.init_vocoder_weights(np.random.default_rng(2025), vcfg)
    vcodes = jnp.asarray(rng.integers(0, 2048, (1, 6, 16)), jnp.int32)
    out["vocoder_audio"] = np.asarray(vocoder.vocoder_decode(vw, vcfg, vcodes))

    scfg = spk.tiny_speaker_encoder_config()
    sw = spk.init_speaker_encoder_weights(np.random.default_rng(2026), scfg)
    mel = jnp.asarray(rng.standard_normal((1, 32, scfg.n_mels)), jnp.float32)
    out["speaker_embedding"] = np.asarray(
        spk.encode(sw, scfg, mel, jnp.asarray([32], jnp.int32)))

    samples = rng.standard_normal(600).astype(np.float32)
    out["mel_spectrogram"] = spk.mel_spectrogram(samples, scfg)
    return out


def main():
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    fixture = build_fixture()
    np.savez_compressed(GOLDEN_DIR / "tiny_activations.npz", **fixture)
    for k, v in fixture.items():
        print(f"  {k}: {v.shape} {v.dtype}")
    print(f"wrote {GOLDEN_DIR / 'tiny_activations.npz'}")


if __name__ == "__main__":
    main()
