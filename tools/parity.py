#!/usr/bin/env python3
"""Per-stage activation parity: independent PyTorch reference vs this stack.

The reference project validates its exports against the PyTorch source of
truth at conversion time (export_code_predictor.py:315-331,
convert_code_predictor_to_coreml.py:297-347) and dev-looped on dumped
tensor diffs (.gitignore:12-15). This tool plays that role here:

  1. loads an HF-layout checkpoint directory (config.json + safetensors),
  2. runs a SEPARATE torch implementation of each stage, written from the
     reference C++ semantics (citations inline) against the raw HF
     tensors — no shared code with the JAX stack,
  3. converts the same checkpoint to GGUF, runs the JAX stack on the same
     inputs, and reports per-stage max-abs-diff + cosine similarity.

Stages: prefill-embedding recipe, talker prefill forward, talker decode
step (validated against a torch FULL forward over prefill+1 rows — this
cross-checks the KV-cache path), greedy code predictor, vocoder decode.

Runs end-to-end on the synthetic fixtures (tests/test_converter.py)
today; point --tts/--codec at real checkpoints when available.

Usage:
  python tools/parity.py --tts <hf_dir> [--codec <hf_dir>]
                         [--out parity.npz] [--tol 5e-3]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Torch reference (HF tensor layout, independent of the JAX stack)
# ---------------------------------------------------------------------------

def _load_hf(d: Path) -> dict:
    from safetensors import safe_open
    out = {}
    files = sorted(d.glob("*.safetensors"))
    if not files and (d / "speech_tokenizer").exists():
        files = sorted((d / "speech_tokenizer").glob("*.safetensors"))
    for p in files:
        with safe_open(str(p), framework="np") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
    return out


class TorchTalker:
    """Reference talker forward in torch (tts_transformer.cpp:1233-1512)."""

    def __init__(self, hf: dict, cfg: dict):
        import torch
        self.t = {k: torch.from_numpy(np.asarray(v, np.float32))
                  for k, v in hf.items()}
        tk = cfg["talker_config"]
        self.H = tk["hidden_size"]
        self.L = tk["num_hidden_layers"]
        self.NH = tk["num_attention_heads"]
        self.NKV = tk["num_key_value_heads"]
        self.HD = tk["head_dim"]
        self.eps = tk.get("rms_norm_eps", 1e-6)
        self.theta = tk.get("rope_theta", 1e6)
        cp = tk.get("code_predictor_config", {})
        self.cp_L = cp.get("num_hidden_layers", 5)
        # the code predictor's head geometry is its own (the converter
        # and TalkerConfig plumb separate code_pred head counts); using
        # the talker's here reported false parity failures for variants
        self.cp_NH = cp.get("num_attention_heads", self.NH)
        self.cp_NKV = cp.get("num_key_value_heads", self.NKV)
        self.cp_HD = cp.get("head_dim", self.HD)
        self.n_groups = tk.get("num_code_groups", 16)

    # -- primitives --------------------------------------------------------
    def rms(self, x, w):
        import torch
        var = (x.float() ** 2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + self.eps) * w

    def rope(self, x, positions):
        """NEOX pairs (i, i+D/2) — ggml_rope_ext(GGML_ROPE_TYPE_NEOX),
        tts_transformer.cpp:1290-1296. x: [B,T,nh,D]."""
        import torch
        D = x.shape[-1]
        half = D // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * (-2.0 / D) * math.log(self.theta))
        ang = positions.float()[..., None] * freqs          # [B,T,half]
        cos, sin = torch.cos(ang)[:, :, None], torch.sin(ang)[:, :, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)

    def _layer(self, p, x, positions, nh, nkv, hd):
        import torch
        B, T, H = x.shape
        h = self.rms(x, self.t[f"{p}.input_layernorm.weight"])
        q = h @ self.t[f"{p}.self_attn.q_proj.weight"].T
        k = h @ self.t[f"{p}.self_attn.k_proj.weight"].T
        v = h @ self.t[f"{p}.self_attn.v_proj.weight"].T
        q = q.view(B, T, nh, hd)
        k = k.view(B, T, nkv, hd)
        v = v.view(B, T, nkv, hd)
        q = self.rms(q, self.t[f"{p}.self_attn.q_norm.weight"])
        k = self.rms(k, self.t[f"{p}.self_attn.k_norm.weight"])
        q = self.rope(q, positions)
        k = self.rope(k, positions)
        G = nh // nkv
        k = k.repeat_interleave(G, dim=2)
        v = v.repeat_interleave(G, dim=2)
        scores = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        scores = scores.masked_fill(~causal, float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        attn = torch.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, -1)
        x = x + attn @ self.t[f"{p}.self_attn.o_proj.weight"].T
        h = self.rms(x, self.t[f"{p}.post_attention_layernorm.weight"])
        gate = h @ self.t[f"{p}.mlp.gate_proj.weight"].T
        up = h @ self.t[f"{p}.mlp.up_proj.weight"].T
        x = x + (torch.nn.functional.silu(gate) * up) \
            @ self.t[f"{p}.mlp.down_proj.weight"].T
        return x

    # -- stages ------------------------------------------------------------
    def text_project(self, tokens):
        """text_embd -> fc1 -> SiLU -> fc2 (tts_transformer.cpp:1026-1091).

        Indices clamp to the table (matches jnp.take's clip mode, relevant
        only for tiny synthetic vocabs where real special ids overflow)."""
        import torch
        table = self.t["talker.model.text_embedding.weight"]
        tokens = torch.clamp(tokens, max=table.shape[0] - 1)
        x = table[tokens]
        x = x @ self.t["talker.text_projection.linear_fc1.weight"].T \
            + self.t["talker.text_projection.linear_fc1.bias"]
        x = torch.nn.functional.silu(x)
        return x @ self.t["talker.text_projection.linear_fc2.weight"].T \
            + self.t["talker.text_projection.linear_fc2.bias"]

    def prefill_embeds(self, tokens, spk, special, codec_ids, language_id):
        """build_prefill_graph recipe (tts_transformer.cpp:1093-1231).

        codec_ids: (think, think_bos, think_eos, pad, bos)."""
        import torch
        tts_bos, tts_eos, tts_pad = [
            self.text_project(torch.tensor([i]))[0] for i in special]
        proj = self.text_project(tokens)                 # [T, H]
        ce = self.t["talker.model.codec_embedding.weight"]

        def crow(i):
            return ce[min(i, ce.shape[0] - 1)]

        think, think_bos, think_eos, pad_id, bos_id = codec_ids
        codec_rows = torch.stack([
            crow(think), crow(think_bos), crow(language_id),
            crow(think_eos), spk, crow(pad_id), crow(bos_id)])
        n = codec_rows.shape[0]
        overlaid = codec_rows[:n - 1] + tts_pad
        overlaid[-1] = codec_rows[n - 2] + tts_bos       # codec_pad row
        last = proj[3] + codec_rows[n - 1]
        prefill = torch.cat([proj[:3], overlaid, last[None]], dim=0)
        trailing = torch.cat([proj[4:len(tokens) - 5], tts_eos[None]], dim=0)
        return prefill, trailing, tts_pad

    def talker_forward(self, embeds):
        """Full causal forward; returns (hidden [T,H], logits [T,V])."""
        import torch
        x = embeds[None].float()
        T = x.shape[1]
        positions = torch.arange(T)[None]
        for i in range(self.L):
            x = self._layer(f"talker.model.layers.{i}", x, positions,
                            self.NH, self.NKV, self.HD)
        h = self.rms(x, self.t["talker.model.norm.weight"])[0]
        logits = h @ self.t["talker.codec_head.weight"].T
        return h, logits

    def code_predictor_greedy(self, hidden, cb0):
        """predict_codes_autoregressive, greedy
        (tts_transformer.cpp:2153-2340): seq = [hidden, codec_embd[cb0],
        cp.codec_embd[s-1][code_s]...]; head[s] picks code_{s+1}.
        Implemented as a growing full forward (no cache) — equivalent."""
        import torch
        mtp_w = self.t.get("talker.code_predictor."
                           "small_to_mtp_projection.weight")
        mtp_b = self.t.get("talker.code_predictor."
                           "small_to_mtp_projection.bias")

        def mtp(x):
            if mtp_w is None:
                return x
            return x @ mtp_w.T + (mtp_b if mtp_b is not None else 0.0)

        rows = [mtp(hidden),
                mtp(self.t["talker.model.codec_embedding.weight"][cb0])]
        codes, logits_all = [], []
        n_steps = self.n_groups - 1
        for s in range(n_steps):
            x = torch.stack(rows)[None]
            T = x.shape[1]
            positions = torch.arange(T)[None]
            for i in range(self.cp_L):
                x = self._layer(f"talker.code_predictor.model.layers.{i}",
                                x, positions, self.cp_NH, self.cp_NKV,
                                self.cp_HD)
            h = self.rms(x[0, -1],
                         self.t["talker.code_predictor.model.norm.weight"])
            head = self.t[f"talker.code_predictor.lm_head.{s}.weight"]
            logits = h @ head.T
            code = int(torch.argmax(logits))
            codes.append(code)
            logits_all.append(logits)
            if s < n_steps - 1:
                emb = self.t[f"talker.code_predictor.model."
                             f"codec_embedding.{s}.weight"][code]
                rows.append(mtp(emb))
        import torch as _t
        return np.asarray(codes, np.int32), _t.stack(logits_all).numpy()


class TorchVocoder:
    """Reference vocoder decode in torch
    (audio_tokenizer_decoder.cpp:622-802)."""

    def __init__(self, hf: dict, cfg: dict):
        import torch
        self.t = {k: torch.from_numpy(np.asarray(v, np.float32))
                  for k, v in hf.items()}
        dec = cfg.get("decoder_config", {})
        self.L = dec.get("num_hidden_layers", 8)
        # defaults must MATCH the stack under test (config.py:142-165 /
        # convert_checkpoints.py), else the comparison runs a different
        # model: heads default 16, rms eps 1e-5
        self.NH = dec.get("num_attention_heads", 16)
        self.n_q = dec.get("num_quantizers", 16)
        self.rates = dec.get("upsample_rates", [8, 5, 4, 3])
        self.eps = 1e-5
        self.theta = 1e4

    def rms(self, x, w):
        import torch
        var = (x.float() ** 2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + self.eps) * w

    def _codebook(self, prefix):
        emb = self.t[f"{prefix}.embedding_sum"]
        usage = self.t.get(f"{prefix}.cluster_usage")
        if usage is not None:
            emb = emb / usage.clamp(min=1e-5)[:, None]
        return emb

    def _causal_conv(self, x, w, b, dilation=1, groups=1):
        """x: [C,T]; w: [out,in/groups,K]; left pad dilation*(K-1)."""
        import torch
        k = w.shape[-1]
        x = torch.nn.functional.pad(x[None], (dilation * (k - 1), 0))
        y = torch.nn.functional.conv1d(x, w, b, dilation=dilation,
                                       groups=groups)
        return y[0]

    def decode(self, codes):
        """codes: [F, n_q] int -> audio [T] (both-sides convT trim — the
        GGML-path behavior, audio_tokenizer_decoder.cpp:581-620)."""
        import torch
        codes = torch.from_numpy(np.asarray(codes, np.int64))
        first_cb = self._codebook(
            "decoder.quantizer.rvq_first.vq.layers.0._codebook")
        first = first_cb[codes[:, 0]]
        first = torch.nn.functional.conv1d(
            first.T[None],
            self.t["decoder.quantizer.rvq_first.output_proj.weight"])[0].T
        rest = 0
        for i in range(self.n_q - 1):
            cb = self._codebook(
                f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook")
            rest = rest + cb[codes[:, i + 1]]
        rest = torch.nn.functional.conv1d(
            rest.T[None],
            self.t["decoder.quantizer.rvq_rest.output_proj.weight"])[0].T
        x = (first + rest).T                               # [C, F]

        x = self._causal_conv(x, self.t["decoder.pre_conv.conv.weight"],
                              self.t["decoder.pre_conv.conv.bias"])

        # pre-transformer (RoPE theta 1e4, causal, layer-scale)
        h = x.T @ self.t["decoder.pre_transformer.input_proj.weight"].T \
            + self.t["decoder.pre_transformer.input_proj.bias"]
        T = h.shape[0]
        positions = torch.arange(T)
        for i in range(self.L):
            p = f"decoder.pre_transformer.layers.{i}"
            hn = self.rms(h, self.t[f"{p}.input_layernorm.weight"])
            q = hn @ self.t[f"{p}.self_attn.q_proj.weight"].T
            k = hn @ self.t[f"{p}.self_attn.k_proj.weight"].T
            v = hn @ self.t[f"{p}.self_attn.v_proj.weight"].T
            hd = q.shape[-1] // self.NH
            half = hd // 2
            freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                              * (-2.0 / hd) * math.log(self.theta))
            ang = positions.float()[:, None] * freqs
            cos, sin = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
            def rope(z):
                z = z.view(T, self.NH, hd)
                z1, z2 = z[..., :half], z[..., half:]
                return torch.cat([z1 * cos - z2 * sin,
                                  z1 * sin + z2 * cos], dim=-1)
            q, k = rope(q), rope(k)
            v = v.view(T, self.NH, hd)
            scores = torch.einsum("thd,shd->hts", q, k) / math.sqrt(hd)
            causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
            scores = scores.masked_fill(~causal, float("-inf"))
            attn = torch.einsum("hts,shd->thd",
                                torch.softmax(scores, -1), v).reshape(T, -1)
            attn = attn @ self.t[f"{p}.self_attn.o_proj.weight"].T
            h = h + attn * self.t[f"{p}.self_attn_layer_scale.scale"]
            hn = self.rms(h, self.t[f"{p}.post_attention_layernorm.weight"])
            gate = hn @ self.t[f"{p}.mlp.gate_proj.weight"].T
            up = hn @ self.t[f"{p}.mlp.up_proj.weight"].T
            ffn = (torch.nn.functional.silu(gate) * up) \
                @ self.t[f"{p}.mlp.down_proj.weight"].T
            h = h + ffn * self.t[f"{p}.mlp_layer_scale.scale"]
        h = self.rms(h, self.t["decoder.pre_transformer.norm.weight"])
        x = (h @ self.t["decoder.pre_transformer.output_proj.weight"].T
             + self.t["decoder.pre_transformer.output_proj.bias"]).T

        # 2 ConvNeXt upsample blocks (convT stride 2, no trim)
        for i in range(2):
            p = f"decoder.upsample.{i}"
            x = torch.nn.functional.conv_transpose1d(
                x[None], self.t[f"{p}.0.conv.weight"],
                self.t[f"{p}.0.conv.bias"], stride=2)[0]
            res = x
            c = x.shape[0]
            x = self._causal_conv(x, self.t[f"{p}.1.dwconv.conv.weight"],
                                  self.t[f"{p}.1.dwconv.conv.bias"],
                                  groups=c)
            xt = x.T
            mu = xt.mean(-1, keepdim=True)
            var = xt.var(-1, unbiased=False, keepdim=True)
            xt = (xt - mu) / torch.sqrt(var + 1e-6) \
                * self.t[f"{p}.1.norm.weight"] + self.t[f"{p}.1.norm.bias"]
            xt = xt @ self.t[f"{p}.1.pwconv1.weight"].T \
                + self.t[f"{p}.1.pwconv1.bias"]
            xt = torch.nn.functional.gelu(xt, approximate="tanh")
            xt = xt @ self.t[f"{p}.1.pwconv2.weight"].T \
                + self.t[f"{p}.1.pwconv2.bias"]
            x = res + (xt * self.t[f"{p}.1.gamma"]).T

        x = self._causal_conv(x, self.t["decoder.decoder.0.conv.weight"],
                              self.t["decoder.decoder.0.conv.bias"])

        def snake(z, a, b):
            import torch
            return z + torch.exp(-b)[:, None] \
                * torch.sin(torch.exp(a)[:, None] * z) ** 2

        for blk, rate in zip(range(1, 5), self.rates):
            p = f"decoder.decoder.{blk}.block"
            x = snake(x, self.t[f"{p}.0.alpha"], self.t[f"{p}.0.beta"])
            w = self.t[f"{p}.1.conv.weight"]
            k = w.shape[-1]
            x = torch.nn.functional.conv_transpose1d(
                x[None], w, stride=rate)[0]
            trim = k - rate
            if trim > 0:
                x = x[:, trim:x.shape[1] - trim]
            x = x + self.t[f"{p}.1.conv.bias"][:, None]
            for res_i, dil in zip((2, 3, 4), (1, 3, 9)):
                rp = f"{p}.{res_i}"
                r = x
                x = snake(x, self.t[f"{rp}.act1.alpha"],
                          self.t[f"{rp}.act1.beta"])
                x = self._causal_conv(x, self.t[f"{rp}.conv1.conv.weight"],
                                      self.t[f"{rp}.conv1.conv.bias"],
                                      dilation=dil)
                x = snake(x, self.t[f"{rp}.act2.alpha"],
                          self.t[f"{rp}.act2.beta"])
                x = self._causal_conv(x, self.t[f"{rp}.conv2.conv.weight"],
                                      self.t[f"{rp}.conv2.conv.bias"])
                x = r + x
        x = snake(x, self.t["decoder.decoder.5.alpha"],
                  self.t["decoder.decoder.5.beta"])
        x = self._causal_conv(x, self.t["decoder.decoder.6.conv.weight"],
                              self.t["decoder.decoder.6.conv.bias"])
        import torch
        return torch.tanh(x[0]).numpy()


# ---------------------------------------------------------------------------
# Diff driver
# ---------------------------------------------------------------------------

def _stats(name, a, b, tol, failures):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    if a.shape != b.shape:
        log(f"  {name:<24} SHAPE MISMATCH {a.shape} vs {b.shape}")
        failures.append(name)
        return
    mad = np.abs(a - b).max() if a.size else 0.0
    amax = np.abs(a).max() if a.size else 0.0
    rel = mad / max(amax, 1e-12)
    denom = (np.linalg.norm(a) * np.linalg.norm(b)) or 1.0
    cos = float(np.dot(a, b) / denom)
    # gate on max|diff| RELATIVE to the reference tensor's magnitude
    # (the JAX stack computes matmuls in bf16; the torch reference runs
    # f32, so the honest bound is relative). Cosine is a diagnostic
    # only — near-unit cosine over a large flattened tensor can mask a
    # single wrong row big enough to flip the downstream argmax, which
    # a relative max-diff cannot.
    ok = rel <= tol or mad <= tol
    log(f"  {name:<24} max|diff|={mad:.3e}  rel={rel:.3e}  "
        f"cos={cos:.6f}  {'OK' if ok else 'FAIL'}")
    if not ok:
        failures.append(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tts", type=Path, help="HF TTS checkpoint dir")
    ap.add_argument("--codec", type=Path, help="HF codec checkpoint dir")
    ap.add_argument("--out", type=Path, help="save stage dumps to .npz")
    # Weights/matmuls run f32 on both sides (the JAX stack is loaded
    # with MATMUL_DTYPE=f32 below); the residual difference is the bf16
    # KV-cache rounding, a production semantic that mirrors the
    # reference's F16 cache (tts_transformer.cpp:794-842) — measured
    # 1.5e-3..6.4e-3 relative across synthetic-fixture seeds.
    ap.add_argument("--tol", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if not args.tts and not args.codec:
        ap.error("need --tts and/or --codec")

    # Numerics tool: run on CPU in f32 (the axon platform would otherwise
    # grab the TPU; sitecustomize pre-imports jax, so force via config).
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import convert_checkpoints as cc
    from qwen3_tts_tpu.config import TalkerConfig, VocoderConfig
    from qwen3_tts_tpu.io.gguf import GGUFReader
    from qwen3_tts_tpu.models import code_predictor, talker, vocoder
    from qwen3_tts_tpu.models import weights as weights_mod
    from qwen3_tts_tpu.models.weights import load_talker_weights

    # f32-vs-f32 comparison: production loads weights in bf16 (MXU
    # dtype), which injects ~1e-2 relative noise vs the torch f32
    # reference after 28 layers and forces a loose gate. Loading the
    # stack under test in f32 isolates the MATH from the storage dtype.
    weights_mod.MATMUL_DTYPE = jnp.float32

    rng = np.random.default_rng(args.seed)
    failures: list[str] = []
    dumps: dict[str, np.ndarray] = {}

    if args.tts:
        import torch
        hf = _load_hf(args.tts)
        cfg_json = json.loads((args.tts / "config.json").read_text())
        ref = TorchTalker(hf, cfg_json)
        with tempfile.TemporaryDirectory() as td:
            gguf_path = Path(td) / "tts.gguf"
            cc.convert_tts(args.tts, gguf_path, "f32")
            with GGUFReader(str(gguf_path)) as r:
                cfg = TalkerConfig.from_gguf(r)
                w = load_talker_weights(r, cfg)

        # Clamp special ids into the checkpoint's vocabs — a no-op for
        # real checkpoints; the synthetic fixtures use tiny vocabs with
        # the real (out-of-range) default ids, which jnp.take would
        # NaN-fill.
        import dataclasses
        tv, cv = cfg.text_vocab_size, cfg.codec_vocab_size
        cfg = dataclasses.replace(
            cfg,
            tts_bos_token_id=min(cfg.tts_bos_token_id, tv - 1),
            tts_eos_token_id=min(cfg.tts_eos_token_id, tv - 2),
            tts_pad_token_id=min(cfg.tts_pad_token_id, tv - 3),
            codec_think_id=min(cfg.codec_think_id, cv - 1),
            codec_think_bos_id=min(cfg.codec_think_bos_id, cv - 2),
            codec_think_eos_id=min(cfg.codec_think_eos_id, cv - 3),
            codec_pad_id=min(cfg.codec_pad_id, cv - 4),
            codec_bos_id=min(cfg.codec_bos_id, cv - 5))

        n_tok = 16
        tokens = rng.integers(0, cfg.text_vocab_size, (n_tok,))
        spk = rng.standard_normal(cfg.hidden_size).astype(np.float32) * 0.1
        lang = min(cfg.english_language_id, cfg.codec_vocab_size - 1)

        log("== talker stages ==")
        # stage 1: prefill-embedding recipe
        t_prefill, t_trailing, _ = ref.prefill_embeds(
            torch.from_numpy(tokens), torch.from_numpy(spk),
            (cfg.tts_bos_token_id, cfg.tts_eos_token_id,
             cfg.tts_pad_token_id),
            (cfg.codec_think_id, cfg.codec_think_bos_id,
             cfg.codec_think_eos_id, cfg.codec_pad_id, cfg.codec_bos_id),
            lang)
        j_pf = talker.build_prefill_inputs(
            w, cfg, jnp.asarray(tokens[None], jnp.int32),
            jnp.asarray([n_tok], jnp.int32), jnp.asarray(spk[None]),
            language_id=jnp.asarray([lang], jnp.int32))
        _stats("prefill_embd", t_prefill.numpy(),
               np.asarray(j_pf.prefill_embd[0]), args.tol, failures)
        t_len = int(j_pf.trailing_len[0])
        _stats("trailing_schedule", t_trailing.numpy(),
               np.asarray(j_pf.trailing_hidden[0, :t_len]),
               args.tol, failures)
        dumps["prefill_embd"] = t_prefill.numpy()

        # stage 2: talker prefill forward (last hidden + logits)
        t_h, t_logits = ref.talker_forward(t_prefill)
        from qwen3_tts_tpu.models.stack import init_kv_cache
        P = t_prefill.shape[0]
        ctx = ((P + 2 + 127) // 128) * 128
        cache = init_kv_cache(cfg.n_layers, 1, ctx, cfg.n_key_value_heads,
                              cfg.head_dim)
        j_h, j_logits, cache = talker.talker_prefill(
            w, cfg, j_pf.prefill_embd, cache)
        _stats("talker_hidden", t_h[-1].numpy(), np.asarray(j_h[0]),
               args.tol, failures)
        _stats("talker_logits", t_logits[-1].numpy(),
               np.asarray(j_logits[0]), args.tol, failures)
        dumps["talker_hidden"] = t_h.numpy()
        dumps["talker_logits"] = t_logits.numpy()

        # stage 3: decode step == full forward over prefill+1 rows
        # (cross-checks the incremental KV-cache path)
        step_row = torch.from_numpy(
            rng.standard_normal(cfg.hidden_size).astype(np.float32) * 0.1)
        t_h2, t_logits2 = ref.talker_forward(
            torch.cat([t_prefill, step_row[None]], dim=0))
        j_h2, j_logits2, _ = talker.talker_step(
            w, cfg, jnp.asarray(step_row.numpy()[None]), cache,
            jnp.full((1,), P, jnp.int32))
        _stats("step_hidden", t_h2[-1].numpy(), np.asarray(j_h2[0]),
               args.tol, failures)
        _stats("step_logits", t_logits2[-1].numpy(),
               np.asarray(j_logits2[0]), args.tol, failures)

        # stage 4: greedy code predictor
        cb0 = int(rng.integers(0, min(2048, cfg.codec_vocab_size)))
        t_codes, t_cp_logits = ref.code_predictor_greedy(
            torch.from_numpy(np.asarray(t_h[-1])), cb0)
        j_codes = code_predictor.predict_codes(
            w, cfg, j_h, jnp.asarray([cb0], jnp.int32),
            jnp.float32(0.0), 1, jax.random.PRNGKey(0), greedy=True)
        same = np.array_equal(t_codes, np.asarray(j_codes[0]))
        log(f"  {'code_pred_codes':<24} torch {t_codes.tolist()} "
            f"jax {np.asarray(j_codes[0]).tolist()}  "
            f"{'OK' if same else 'FAIL'}")
        if not same:
            failures.append("code_pred_codes")
        dumps["code_pred_codes"] = t_codes
        dumps["code_pred_logits"] = t_cp_logits

    if args.codec:
        hf = _load_hf(args.codec)
        cfg_json = json.loads((args.codec / "config.json").read_text())
        refv = TorchVocoder(hf, cfg_json)
        with tempfile.TemporaryDirectory() as td:
            gguf_path = Path(td) / "codec.gguf"
            cc.convert_codec(args.codec, gguf_path, "f32")
            with GGUFReader(str(gguf_path)) as r:
                vcfg = VocoderConfig.from_gguf(r)
                vw = vocoder.load_vocoder_weights(r, vcfg)

        log("== vocoder ==")
        F = 12
        codes = rng.integers(0, vcfg.codebook_size, (F, vcfg.n_codebooks))
        t_audio = refv.decode(codes)
        j_audio = np.asarray(vocoder.vocoder_decode(
            vw, vcfg, jnp.asarray(codes[None], jnp.int32))[0])
        _stats("vocoder_audio", t_audio, j_audio, args.tol, failures)
        dumps["vocoder_audio"] = t_audio

    if args.out:
        np.savez(args.out, **dumps)
        log(f"dumps saved to {args.out}")

    if failures:
        log(f"PARITY FAIL: {failures}")
        return 1
    log("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
