"""Core transformer ops: RMSNorm, NEOX RoPE, SwiGLU, GQA attention.

These are the TPU-native equivalents of the GGML graph fragments the
reference builds per call (tts_transformer.cpp:1233-1512): jitted once per
shape, batched over streams, bf16 matmuls on the MXU with f32 softmax/norm
math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """GGML-style RMSNorm: x / sqrt(mean(x^2)+eps) * w, computed in f32."""
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale) * weight.astype(jnp.float32)


def rope_neox(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """NEOX-style rotary embedding over the full head dim.

    Matches ggml_rope_ext(..., GGML_ROPE_TYPE_NEOX, ...) as used at
    tts_transformer.cpp:1290-1296: pairs are (i, i + D/2).

    x: [..., T, n_heads, D]; positions: broadcastable to [..., T].
    """
    d = x.shape[-1]
    half = d // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-2.0 / d) * jnp.log(theta))
    ang = positions.astype(jnp.float32)[..., None] * freqs       # [..., T, half]
    cos = jnp.cos(ang)[..., None, :]                              # [..., T, 1, half]
    sin = jnp.sin(ang)[..., None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def swiglu(x: jax.Array, w_gate: jax.Array, w_up: jax.Array,
           w_down: jax.Array) -> jax.Array:
    """SwiGLU FFN: (silu(x@Wg) * (x@Wu)) @ Wd (tts_transformer.cpp:1346-1353)."""
    gate = jnp.dot(x, w_gate, preferred_element_type=jnp.float32)
    up = jnp.dot(x, w_up, preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(w_down.dtype)
    return jnp.dot(act, w_down, preferred_element_type=jnp.float32)


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: [B, Hkv, G, T, D], k: [B, Hkv, S, D] -> [B, Hkv, G, T, S] f32."""
    return jnp.einsum("bkgtd,bksd->bkgts", q, k,
                      preferred_element_type=jnp.float32)


def gqa_attention_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                          n_past: jax.Array | int = 0) -> jax.Array:
    """Batched causal GQA over a prefix written to the cache.

    q: [B, T, n_heads, D] — new queries
    k, v: [B, S, n_kv, D] — full keys/values (S >= n_past + T)
    Causality: query t may attend to positions <= n_past + t.
    Returns [B, T, n_heads*D].
    """
    B, T, n_heads, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_heads // n_kv
    scale = 1.0 / (D ** 0.5)

    qh = q.reshape(B, T, n_kv, G, D).transpose(0, 2, 3, 1, 4)    # [B,Hkv,G,T,D]
    kh = k.transpose(0, 2, 1, 3)                                  # [B,Hkv,S,D]
    vh = v.transpose(0, 2, 1, 3)

    scores = _gqa_scores(qh, kh) * scale                          # [B,Hkv,G,T,S]
    t_idx = jnp.arange(T)[:, None]
    s_idx = jnp.arange(S)[None, :]
    mask = s_idx <= (t_idx + n_past)                              # [T,S]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, n_heads * D)


def gqa_attention_step(q: jax.Array, k: jax.Array, v: jax.Array,
                       n_valid: jax.Array) -> jax.Array:
    """Single-token decode attention over an HBM-resident cache.

    q: [B, n_heads, D]; k, v: [B, S, n_kv, D] (padded cache);
    n_valid: [B] number of valid cache positions per stream.
    Returns [B, n_heads*D].

    This is the XLA path (flash-decode Pallas kernel is the optimized
    alternative in ops/flash_decode.py).
    """
    S = k.shape[1]
    mask = jnp.arange(S)[None, :] < n_valid[:, None]              # [B,S]
    return gqa_attention_step_masked(q, k, v, mask)


def gqa_attention_step_kvmajor(q: jax.Array, k: jax.Array, v: jax.Array,
                               mask: jax.Array,
                               k_scale: jax.Array | None = None,
                               v_scale: jax.Array | None = None) -> jax.Array:
    """Decode attention over a kv-heads-major cache: k, v are [B, n_kv, S, D].

    This is the production decode path. The cache is stored kv-heads-major
    ([L,2,B,n_kv,S,D], models/stack.py) so the score/value einsums read it
    DIRECTLY — with the seq-major [B,S,n_kv,D] layout XLA materializes a
    transposed copy of both K and V every layer (~100 MB/layer at B=48
    S=512), which measured 3-6x slower per layer (NOTES.md round-2
    "cache layout" entry).

    q: [B, n_heads, D]; mask: [B, S] bool — cache slots each stream may
    attend (prefix masks and ring-slot bitmasks both reduce to this).

    int8 cache (models/stack.QuantKV): pass k_scale/v_scale [B, n_kv, S].
    Dequantization folds into the existing math — scores pick up the
    per-slot K scale after the QK^T dot; the per-slot V scale multiplies
    the probs before the PV dot (sum_t p_t*(v_t*s_t) == sum_t (p_t*s_t)*v_t).
    The dots consume the int8 tensors directly, so HBM reads stay 1 byte/
    element and no dequantized cache copy is ever materialized.
    Returns [B, n_heads*D] f32.
    """
    B, n_heads, D = q.shape
    n_kv, S = k.shape[1], k.shape[2]
    G = n_heads // n_kv
    scale = 1.0 / (D ** 0.5)

    qh = q.reshape(B, n_kv, G, D)
    if k.dtype == jnp.int8:
        scores = jnp.einsum("bkgd,bksd->bkgs", qh,
                            k.astype(qh.dtype),
                            preferred_element_type=jnp.float32)
        scores = scores * (k_scale[:, :, None, :] * scale)
    else:
        scores = jnp.einsum("bkgd,bksd->bkgs", qh, k,
                            preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if v.dtype == jnp.int8:
        pv = (probs * v_scale[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum("bkgs,bksd->bkgd", pv, v.astype(pv.dtype),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bkgs,bksd->bkgd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return out.reshape(B, n_heads * D)


def gqa_attention_step_masked(q: jax.Array, k: jax.Array, v: jax.Array,
                              mask: jax.Array) -> jax.Array:
    """Decode attention with an explicit per-slot validity bitmask.

    q: [B, n_heads, D]; k, v: [B, S, n_kv, D] (seq-major layout); mask:
    [B, S] bool — cache slots each stream may attend. Kept as the
    reference implementation for the flash-decode kernel tests; production
    uses gqa_attention_step_kvmajor on the kv-major cache layout.
    """
    B, n_heads, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_heads // n_kv
    scale = 1.0 / (D ** 0.5)

    qh = q.reshape(B, n_kv, G, 1, D)
    kh = k.transpose(0, 2, 1, 3)                                  # [B,Hkv,S,D]
    vh = v.transpose(0, 2, 1, 3)
    scores = _gqa_scores(qh, kh) * scale                          # [B,Hkv,G,1,S]
    scores = jnp.where(mask[:, None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, n_heads * D)

def fast_sin2(z: jax.Array) -> jax.Array:
    """sin^2(z) via pi-periodic range reduction + 9th-order odd
    polynomial; max abs error ~3.5e-7 vs sin^2 for |z| <= 1000 (f32).

    sin^2 is pi-periodic and sign-free, so r = z - round(z/pi)*pi in
    [-pi/2, pi/2] gives sin^2(z) = sin^2(r) with no sign/quadrant
    bookkeeping. The reduction is Cody-Waite split (pi_hi exact in 13
    bits) to keep f32 accuracy at large |z|; the polynomial is a
    least-squares fit of sin(r)/r in r^2 on [0, pi/2]. ~13 VPU ops vs
    ~26 for the exact sine. Used by the vocoder snake activation
    (models/vocoder.py), whose passes over the 76,800-sample chunk tail
    are VPU-bound on the sine (NOTES.md). Works inside Pallas kernels
    (round/fma only).

    The argument is clamped to |z| <= 3e4: beyond that the f32 reduction
    residue is precision noise (true for the exact sine too — one f32 ulp
    at 3e4 spans several periods), but the polynomial would overflow to
    inf where jnp.sin stays bounded; clamping keeps the output finite for
    arbitrary inputs (e.g. random-weight tests driving activations to
    1e10)."""
    pi_hi = 3.140625
    pi_lo = 0.0009676535897932
    z = jnp.clip(z, -3e4, 3e4)
    n = jnp.round(z * (1.0 / 3.14159265358979))
    r = z - n * pi_hi - n * pi_lo
    r2 = r * r
    s = r * (1.0 + r2 * (-0.16666662 + r2 * (0.0083331258
                                             + r2 * (-0.00019814119
                                                     + r2 * 2.6160287e-06))))
    return s * s
