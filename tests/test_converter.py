"""Offline converter round-trip: synthetic HF checkpoint -> GGUF -> runtime
loaders. Proves the tensor-name mapping, metadata keys, and weight loaders
agree end-to-end (the parity the reference validates by hand across
convert_tts_to_gguf.py / tts_transformer.cpp)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import convert_checkpoints as cc  # noqa: E402

from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig
from qwen3_tts_tpu.io.gguf import GGUFReader
from qwen3_tts_tpu.models.weights import load_talker_weights
from qwen3_tts_tpu.models.vocoder import load_vocoder_weights
from qwen3_tts_tpu.tokenizer import TextTokenizer

safetensors = pytest.importorskip("safetensors.numpy")


def make_tts_checkpoint(d: Path, rng, intermediate: int = 32):
    H, E, L, NH, NKV, HD, I = 16, 24, 2, 2, 1, 8, intermediate
    CP_L, CPV, CV, VT = 2, 64, 128, 96
    cfg = {
        "talker_config": {
            "hidden_size": H, "intermediate_size": I, "num_hidden_layers": L,
            "num_attention_heads": NH, "num_key_value_heads": NKV,
            "head_dim": HD, "vocab_size": CV, "text_vocab_size": VT,
            "text_hidden_size": E, "num_code_groups": 4,
            "rms_norm_eps": 1e-6, "rope_theta": 1e6,
            "code_predictor_config": {
                "num_hidden_layers": CP_L, "vocab_size": CPV,
            },
        },
        "speaker_encoder_config": {"enc_dim": H, "sample_rate": 24000},
    }
    (d / "config.json").write_text(json.dumps(cfg))
    (d / "vocab.json").write_text(json.dumps(
        {"a": 0, "b": 1, "assistant": 2, "Ċ": 3, "<|im_start|>": 4,
         "<|im_end|>": 5}))
    (d / "merges.txt").write_text("a b\n")
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"eos_token": "<|im_end|>", "pad_token": "b"}))

    t = {}
    t["talker.model.text_embedding.weight"] = rng.standard_normal((VT, E))
    t["talker.model.codec_embedding.weight"] = rng.standard_normal((CV, H))
    t["talker.codec_head.weight"] = rng.standard_normal((CV, H))
    t["talker.model.norm.weight"] = rng.standard_normal(H)
    t["talker.text_projection.linear_fc1.weight"] = rng.standard_normal((E, E))
    t["talker.text_projection.linear_fc1.bias"] = rng.standard_normal(E)
    t["talker.text_projection.linear_fc2.weight"] = rng.standard_normal((H, E))
    t["talker.text_projection.linear_fc2.bias"] = rng.standard_normal(H)
    for i in range(L):
        p = f"talker.model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = rng.standard_normal(H)
        t[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal((NH * HD, H))
        t[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal((NKV * HD, H))
        t[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal((NKV * HD, H))
        t[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal((H, NH * HD))
        t[f"{p}.self_attn.q_norm.weight"] = rng.standard_normal(HD)
        t[f"{p}.self_attn.k_norm.weight"] = rng.standard_normal(HD)
        t[f"{p}.post_attention_layernorm.weight"] = rng.standard_normal(H)
        t[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal((I, H))
        t[f"{p}.mlp.up_proj.weight"] = rng.standard_normal((I, H))
        t[f"{p}.mlp.down_proj.weight"] = rng.standard_normal((H, I))
    for i in range(CP_L):
        p = f"talker.code_predictor.model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = rng.standard_normal(H)
        t[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal((NH * HD, H))
        t[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal((NKV * HD, H))
        t[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal((NKV * HD, H))
        t[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal((H, NH * HD))
        t[f"{p}.self_attn.q_norm.weight"] = rng.standard_normal(HD)
        t[f"{p}.self_attn.k_norm.weight"] = rng.standard_normal(HD)
        t[f"{p}.post_attention_layernorm.weight"] = rng.standard_normal(H)
        t[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal((I, H))
        t[f"{p}.mlp.up_proj.weight"] = rng.standard_normal((I, H))
        t[f"{p}.mlp.down_proj.weight"] = rng.standard_normal((H, I))
    t["talker.code_predictor.model.norm.weight"] = rng.standard_normal(H)
    for i in range(3):  # n_code_groups - 1
        t[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = \
            rng.standard_normal((CPV, H))
        t[f"talker.code_predictor.lm_head.{i}.weight"] = \
            rng.standard_normal((CPV, H))

    # Tiny ECAPA speaker encoder (default mel geometry n_mels=128/scale=8,
    # small channel dims — SpeakerEncoderConfig restores only sample_rate
    # + embedding_length from GGUF metadata, config.py:184-188). Covers
    # the convert -> lazy-load -> encode_speaker path end-to-end.
    SH, SCALE = 16, 8           # hidden, res2net scale (config defaults)
    SBR, SSE, SMFA = SH // SCALE, max(SH // 4, 1), 3 * SH
    t["speaker_encoder.blocks.0.conv.weight"] = \
        rng.standard_normal((SH, 128, 5)) * 0.1
    t["speaker_encoder.blocks.0.conv.bias"] = rng.standard_normal(SH) * 0.1
    for i in (1, 2, 3):
        p = f"speaker_encoder.blocks.{i}"
        for j in (1, 2):
            t[f"{p}.tdnn{j}.conv.weight"] = \
                rng.standard_normal((SH, SH, 1)) * 0.1
            t[f"{p}.tdnn{j}.conv.bias"] = rng.standard_normal(SH) * 0.1
        for j in range(SCALE - 1):
            t[f"{p}.res2net_block.blocks.{j}.conv.weight"] = \
                rng.standard_normal((SBR, SBR, 3)) * 0.1
            t[f"{p}.res2net_block.blocks.{j}.conv.bias"] = \
                rng.standard_normal(SBR) * 0.1
        t[f"{p}.se_block.conv1.weight"] = \
            rng.standard_normal((SSE, SH, 1)) * 0.1
        t[f"{p}.se_block.conv1.bias"] = rng.standard_normal(SSE) * 0.1
        t[f"{p}.se_block.conv2.weight"] = \
            rng.standard_normal((SH, SSE, 1)) * 0.1
        t[f"{p}.se_block.conv2.bias"] = rng.standard_normal(SH) * 0.1
    t["speaker_encoder.mfa.conv.weight"] = \
        rng.standard_normal((SMFA, SMFA, 1)) * 0.1
    t["speaker_encoder.mfa.conv.bias"] = rng.standard_normal(SMFA) * 0.1
    t["speaker_encoder.asp.tdnn.conv.weight"] = \
        rng.standard_normal((SSE, SMFA * 3, 1)) * 0.1
    t["speaker_encoder.asp.tdnn.conv.bias"] = rng.standard_normal(SSE) * 0.1
    t["speaker_encoder.asp.conv.weight"] = \
        rng.standard_normal((SMFA, SSE, 1)) * 0.1
    t["speaker_encoder.asp.conv.bias"] = rng.standard_normal(SMFA) * 0.1
    t["speaker_encoder.fc.weight"] = \
        rng.standard_normal((H, 2 * SMFA, 1)) * 0.1
    t["speaker_encoder.fc.bias"] = rng.standard_normal(H) * 0.1
    arrays = {k: np.asarray(v, np.float32) for k, v in t.items()}
    safetensors.save_file(arrays, str(d / "model.safetensors"))
    return arrays


def test_tts_roundtrip(tmp_path, rng):
    ckpt = tmp_path / "hf"
    ckpt.mkdir()
    arrays = make_tts_checkpoint(ckpt, rng)
    out = tmp_path / "tts.gguf"
    cc.convert_tts(ckpt, out, "f32")

    with GGUFReader(str(out)) as r:
        cfg = TalkerConfig.from_gguf(r)
        assert cfg.hidden_size == 16
        assert cfg.n_layers == 2
        assert cfg.n_codebooks == 4
        assert cfg.code_pred_vocab_size == 64
        w = load_talker_weights(r, cfg)
        tok = TextTokenizer.from_gguf(r)

    # spot-check tensor data survived the mapping (loader pre-transposes)
    np.testing.assert_allclose(
        np.asarray(w["codec_embd"], dtype=np.float32),
        arrays["talker.model.codec_embedding.weight"], atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(w["codec_head"], dtype=np.float32),
        arrays["talker.codec_head.weight"].T, atol=1e-2)
    # fused qkv: [in, out] concat of q,k,v transposed
    l0 = np.concatenate([
        arrays["talker.model.layers.0.self_attn.q_proj.weight"].T,
        arrays["talker.model.layers.0.self_attn.k_proj.weight"].T,
        arrays["talker.model.layers.0.self_attn.v_proj.weight"].T], axis=1)
    np.testing.assert_allclose(
        np.asarray(w["layers"]["wqkv"][0], dtype=np.float32), l0, atol=1e-2)
    assert w["code_pred"]["mtp_w"] is None

    # tokenizer embedded with special ids resolved from the vocab
    assert tok.special.eos_token_id == 5
    assert tok.special.assistant_token_id == 2
    assert tok.special.newline_token_id == 3


def make_codec_checkpoint(d: Path, rng):
    CD, HID, LAT, L = 8, 16, 32, 2
    cfg = {
        "input_sample_rate": 24000,
        "encoder_config": {"codebook_size": 64, "_frame_rate": 12.5},
        "decoder_config": {
            "hidden_size": HID, "num_hidden_layers": L,
            "num_attention_heads": 4, "latent_dim": LAT,
            "num_quantizers": 4, "upsample_rates": [2, 2, 2, 2],
        },
    }
    (d / "config.json").write_text(json.dumps(cfg))
    t = {}
    t["decoder.quantizer.rvq_first.output_proj.weight"] = \
        rng.standard_normal((HID, CD, 1))
    t["decoder.quantizer.rvq_first.input_proj.weight"] = \
        rng.standard_normal((CD, HID, 1))
    t["decoder.quantizer.rvq_rest.output_proj.weight"] = \
        rng.standard_normal((HID, CD, 1))
    t["decoder.quantizer.rvq_rest.input_proj.weight"] = \
        rng.standard_normal((CD, HID, 1))
    t["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"] = \
        rng.standard_normal((64, CD))
    t["decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"] = \
        np.abs(rng.standard_normal(64)) + 0.5
    for i in range(3):
        t[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.embedding_sum"] = \
            rng.standard_normal((64, CD))
        t[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.cluster_usage"] = \
            np.abs(rng.standard_normal(64)) + 0.5
    t["decoder.pre_conv.conv.weight"] = rng.standard_normal((LAT, HID, 3))
    t["decoder.pre_conv.conv.bias"] = rng.standard_normal(LAT)
    t["decoder.pre_transformer.input_proj.weight"] = \
        rng.standard_normal((HID, LAT))
    t["decoder.pre_transformer.input_proj.bias"] = rng.standard_normal(HID)
    t["decoder.pre_transformer.output_proj.weight"] = \
        rng.standard_normal((LAT, HID))
    t["decoder.pre_transformer.output_proj.bias"] = rng.standard_normal(LAT)
    t["decoder.pre_transformer.norm.weight"] = rng.standard_normal(HID)
    for i in range(L):
        p = f"decoder.pre_transformer.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = rng.standard_normal(HID)
        t[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal((LAT, HID))
        t[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal((LAT, HID))
        t[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal((LAT, HID))
        t[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal((HID, LAT))
        t[f"{p}.self_attn_layer_scale.scale"] = rng.standard_normal(HID)
        t[f"{p}.post_attention_layernorm.weight"] = rng.standard_normal(HID)
        t[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal((2 * HID, HID))
        t[f"{p}.mlp.up_proj.weight"] = rng.standard_normal((2 * HID, HID))
        t[f"{p}.mlp.down_proj.weight"] = rng.standard_normal((HID, 2 * HID))
        t[f"{p}.mlp_layer_scale.scale"] = rng.standard_normal(HID)
    for i in range(2):
        p = f"decoder.upsample.{i}"
        t[f"{p}.0.conv.weight"] = rng.standard_normal((LAT, LAT, 2))
        t[f"{p}.0.conv.bias"] = rng.standard_normal(LAT)
        t[f"{p}.1.dwconv.conv.weight"] = rng.standard_normal((LAT, 1, 7))
        t[f"{p}.1.dwconv.conv.bias"] = rng.standard_normal(LAT)
        t[f"{p}.1.norm.weight"] = rng.standard_normal(LAT)
        t[f"{p}.1.norm.bias"] = rng.standard_normal(LAT)
        t[f"{p}.1.pwconv1.weight"] = rng.standard_normal((2 * LAT, LAT))
        t[f"{p}.1.pwconv1.bias"] = rng.standard_normal(2 * LAT)
        t[f"{p}.1.pwconv2.weight"] = rng.standard_normal((LAT, 2 * LAT))
        t[f"{p}.1.pwconv2.bias"] = rng.standard_normal(LAT)
        t[f"{p}.1.gamma"] = rng.standard_normal(LAT)
    DD = 32
    t["decoder.decoder.0.conv.weight"] = rng.standard_normal((DD, LAT, 7))
    t["decoder.decoder.0.conv.bias"] = rng.standard_normal(DD)
    c = DD
    for blk in range(1, 5):
        co = c // 2
        t[f"decoder.decoder.{blk}.block.0.alpha"] = rng.standard_normal(c)
        t[f"decoder.decoder.{blk}.block.0.beta"] = rng.standard_normal(c)
        t[f"decoder.decoder.{blk}.block.1.conv.weight"] = \
            rng.standard_normal((c, co, 4))
        t[f"decoder.decoder.{blk}.block.1.conv.bias"] = rng.standard_normal(co)
        for res in (2, 3, 4):
            p = f"decoder.decoder.{blk}.block.{res}"
            t[f"{p}.act1.alpha"] = rng.standard_normal(co)
            t[f"{p}.act1.beta"] = rng.standard_normal(co)
            t[f"{p}.conv1.conv.weight"] = rng.standard_normal((co, co, 7))
            t[f"{p}.conv1.conv.bias"] = rng.standard_normal(co)
            t[f"{p}.act2.alpha"] = rng.standard_normal(co)
            t[f"{p}.act2.beta"] = rng.standard_normal(co)
            t[f"{p}.conv2.conv.weight"] = rng.standard_normal((co, co, 1))
            t[f"{p}.conv2.conv.bias"] = rng.standard_normal(co)
        c = co
    t["decoder.decoder.5.alpha"] = rng.standard_normal(c)
    t["decoder.decoder.5.beta"] = rng.standard_normal(c)
    t["decoder.decoder.6.conv.weight"] = rng.standard_normal((1, c, 7))
    t["decoder.decoder.6.conv.bias"] = rng.standard_normal(1)
    arrays = {k: np.asarray(v, np.float32) for k, v in t.items()}
    safetensors.save_file(arrays, str(d / "model.safetensors"))
    return arrays


def test_tts_q4_output(tmp_path, rng):
    """q4_0/q4_k converter output: exclusion rules keep embeddings, norms,
    biases and heads hi-fi (convert_tts_to_gguf.py:248-335); the weights
    still load and closely match f32."""
    from qwen3_tts_tpu.io.gguf import GGML_F16, GGML_F32, GGML_Q4_0, GGML_Q4_K
    ckpt = tmp_path / "hf"
    ckpt.mkdir()
    # I=256 so down_proj rows are 256-divisible: quantization gates on
    # the LAST dim (GGML blocks must not span rows — gguf-py raises for
    # non-divisible rows and the reference falls back to F16)
    arrays = make_tts_checkpoint(ckpt, rng, intermediate=256)
    for out_type, qt in (("q4_0", GGML_Q4_0), ("q4_k", GGML_Q4_K)):
        out = tmp_path / f"tts_{out_type}.gguf"
        cc.convert_tts(ckpt, out, out_type)
        with GGUFReader(str(out)) as r:
            types = {n: t.ggml_type for n, t in r.tensors.items()}
            # exclusions stay hi-fi
            assert types["talker.codec_embd.weight"] in (GGML_F16, GGML_F32)
            assert types["talker.codec_head.weight"] in (GGML_F16, GGML_F32)
            assert types["talker.blk.0.attn_norm.weight"] == GGML_F32
            # big matmuls are quantized (when block-divisible)
            quantized = [n for n, t in types.items() if t == qt]
            assert quantized, f"no tensors quantized for {out_type}"
            w = load_talker_weights(r, TalkerConfig.from_gguf(r))
        ref = np.concatenate([
            arrays["talker.model.layers.0.self_attn.q_proj.weight"].T,
            arrays["talker.model.layers.0.self_attn.k_proj.weight"].T,
            arrays["talker.model.layers.0.self_attn.v_proj.weight"].T],
            axis=1)
        got = np.asarray(w["layers"]["wqkv"][0], dtype=np.float32)
        assert np.abs(got - ref).max() <= np.abs(ref).max() / 6.0


def test_codec_roundtrip(tmp_path, rng):
    import dataclasses
    import jax.numpy as jnp
    from qwen3_tts_tpu.models.vocoder import vocoder_decode

    ckpt = tmp_path / "hf"
    ckpt.mkdir()
    arrays = make_codec_checkpoint(ckpt, rng)
    out = tmp_path / "codec.gguf"
    cc.convert_codec(ckpt, out, "f32")

    with GGUFReader(str(out)) as r:
        cfg = VocoderConfig.from_gguf(r)
        cfg = dataclasses.replace(
            cfg, codebook_size=64, codebook_dim=8, decoder_dim=32,
            n_codebooks=4)
        w = load_vocoder_weights(r, cfg)

    # converter pre-divides codebooks by usage (convert_tokenizer_to_gguf
    # semantics) and the loader must not re-divide (usage dropped)
    cb = arrays["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"]
    usage = arrays["decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"]
    np.testing.assert_allclose(np.asarray(w["vq_first_codebook"]),
                               cb / np.maximum(usage, 1e-5)[:, None],
                               atol=1e-3)

    codes = jnp.asarray(rng.integers(0, 64, (1, 6, 4)), jnp.int32)
    audio = vocoder_decode(w, cfg, codes)
    assert audio.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(audio)))
