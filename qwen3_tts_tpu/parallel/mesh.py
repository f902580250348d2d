"""Multi-chip scale-out: device mesh + sharding specs.

The reference is strictly single-device (SURVEY.md §2 parallelism table:
no DP/TP/PP, no communication backend). This module is new design space:

  - `dp` axis: the batch of concurrent TTS streams is sharded across
    chips — pure data parallelism, zero collectives in the forward pass.
    This is the primary scale-out (0.6B fits one chip easily).
  - `tp` axis: optional Megatron-style tensor parallelism over attention
    heads / FFN columns for the talker, expressed purely as
    jax.sharding annotations — XLA GSPMD inserts the psum/all-gather
    collectives over ICI (no hand-written NCCL analogue).

Everything runs through the same jitted functions as single-chip; only
the NamedShardings differ.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int, n_tp: int = 1,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_dp * n_tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def unfuse_stack_layers(layers: dict, n_heads: int, n_kv: int,
                        head_dim: int) -> dict:
    """Split the fused wqkv -> wq/wk/wv and w_gu -> w_gate/w_up so each
    projection can be column-sharded on `tp` without crossing the q/k/v
    (or gate/up) internal boundaries. stack.py accepts both layouts."""
    out = dict(layers)
    wqkv = out.pop("wqkv")
    nq, nk = n_heads * head_dim, n_kv * head_dim
    out["wq"] = wqkv[..., :nq]
    out["wk"] = wqkv[..., nq:nq + nk]
    out["wv"] = wqkv[..., nq + nk:]
    w_gu = out.pop("w_gu")
    inter = w_gu.shape[-1] // 2
    out["w_gate"] = w_gu[..., :inter]
    out["w_up"] = w_gu[..., inter:]
    return out


def talker_shardings(mesh: Mesh, unfused: bool = False) -> dict[str, Any]:
    """Sharding pytree matching weights.load_talker_weights's structure.

    Megatron layout: q/k/v and gate/up are column-parallel (output dim on
    `tp`), o and down are row-parallel (input dim on `tp`) — GSPMD
    completes each attention/FFN block with one psum over ICI. Norms and
    embeddings are replicated (embeddings are gathered by token id).

    unfused=True (tp>1): the stack layers carry wq/wk/wv + w_gate/w_up
    (see unfuse_stack_layers) so every projection is genuinely sharded.
    With the fused layout a plain 'tp' column shard would split q/k/v
    (or gate/up) across their internal boundaries, so fused wqkv stays
    replicated there.
    """
    col = _ns(mesh, None, None, "tp")   # [L, in, out@tp]
    row = _ns(mesh, None, "tp", None)   # [L, in@tp, out]
    rep1 = _ns(mesh, None)
    rep2 = _ns(mesh, None, None)
    rep3 = _ns(mesh, None, None, None)

    def stack_spec():
        base = {
            "attn_norm": rep2, "q_norm": rep2, "k_norm": rep2,
            "ffn_norm": rep2,
            "wo": row, "w_down": row,
        }
        if unfused:
            base.update({"wq": col, "wk": col, "wv": col,
                         "w_gate": col, "w_up": col})
        else:
            base.update({"wqkv": rep3, "w_gu": col})
        return base

    return {
        "text_embd": rep2,
        "text_proj": {"fc1_w": rep2, "fc1_b": rep1,
                      "fc2_w": rep2, "fc2_b": rep1},
        "codec_embd": rep2,
        "codec_head": _ns(mesh, None, "tp"),
        "output_norm": rep1,
        "layers": stack_spec(),
        "code_pred": {
            "layers": stack_spec(),
            "output_norm": rep1,
            "embd": rep3,
            "heads": _ns(mesh, None, None, "tp"),
            "mtp_w": rep2,
            "mtp_b": rep1,
        },
    }


def shard_talker_weights(w, mesh: Mesh, cfg=None):
    """Place talker weights on the mesh. For tp>1 pass the TalkerConfig:
    the fused wqkv/w_gu get unfused (talker + code-pred stacks) so every
    projection is column/row-sharded Megatron-style."""
    tp = mesh.shape.get("tp", 1)
    unfused = tp > 1
    if unfused:
        if cfg is None:
            raise ValueError("tp>1 sharding needs cfg to unfuse wqkv/w_gu")
        w = dict(w)
        w["layers"] = unfuse_stack_layers(
            w["layers"], cfg.n_attention_heads, cfg.n_key_value_heads,
            cfg.head_dim)
        w["code_pred"] = dict(w["code_pred"])
        w["code_pred"]["layers"] = unfuse_stack_layers(
            w["code_pred"]["layers"], cfg.code_pred_n_attention_heads,
            cfg.code_pred_n_kv_heads, cfg.code_pred_head_dim)
    specs = talker_shardings(mesh, unfused=unfused)

    def place(x, s):
        return None if x is None else jax.device_put(x, s)

    return jax.tree.map(place, w, specs,
                        is_leaf=lambda x: x is None)


def shard_gen_state(state, mesh: Mesh):
    """GenState sharding: batch over dp, KV heads over tp."""
    from ..models.stack import QuantKV, is_layered

    # kv-major cache [L, 2, B, kv, S, D]: dp on B (dim 2), tp on kv (dim 3)
    cache_s = _ns(mesh, None, None, "dp", "tp", None, None)
    b_s = _ns(mesh, "dp")
    b2_s = _ns(mesh, "dp", None)
    rep = _ns(mesh)
    if is_layered(state.kv_cache):
        # per-layer buffers [2, B, kv, S, D] (values) / [2, B, kv, S]
        # (scales): same dp-on-B, tp-on-kv placement minus the L axis
        lv_s = _ns(mesh, None, "dp", "tp", None, None)
        ls_s = _ns(mesh, None, "dp", "tp", None)

        def place_layer(cl):
            if isinstance(cl, QuantKV):
                return QuantKV(values=jax.device_put(cl.values, lv_s),
                               scales=jax.device_put(cl.scales, ls_s))
            return jax.device_put(cl, lv_s)

        cache = tuple(place_layer(cl) for cl in state.kv_cache)
    elif isinstance(state.kv_cache, QuantKV):
        cache = QuantKV(
            values=jax.device_put(state.kv_cache.values, cache_s),
            scales=jax.device_put(
                state.kv_cache.scales,
                _ns(mesh, None, None, "dp", "tp", None)))
    else:
        cache = jax.device_put(state.kv_cache, cache_s)
    return type(state)(
        kv_cache=cache,
        n_past=jax.device_put(state.n_past, b_s),
        frame_idx=jax.device_put(state.frame_idx, b_s),
        last_hidden=jax.device_put(state.last_hidden, b2_s),
        logits=jax.device_put(state.logits, b2_s),
        seen_mask=jax.device_put(state.seen_mask, b2_s),
        done=jax.device_put(state.done, b_s),
        key=jax.device_put(state.key, rep),
        valid_mask=jax.device_put(state.valid_mask, b2_s),
        write_slot=jax.device_put(state.write_slot, rep),
        ring_lo=jax.device_put(state.ring_lo, b_s),
    )


def shard_consts(consts, mesh: Mesh):
    b2_s = _ns(mesh, "dp", None)
    b3_s = _ns(mesh, "dp", None, None)
    b_s = _ns(mesh, "dp")
    rep = _ns(mesh)
    return type(consts)(
        trailing_hidden=jax.device_put(consts.trailing_hidden, b3_s),
        trailing_len=jax.device_put(consts.trailing_len, b_s),
        tts_pad_embed=jax.device_put(consts.tts_pad_embed, b2_s),
        expected_frames=jax.device_put(consts.expected_frames, b_s),
        temperature=jax.device_put(consts.temperature, rep),
        repetition_penalty=jax.device_put(consts.repetition_penalty, rep),
    )
