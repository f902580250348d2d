"""Layered (per-layer-buffer) talker KV cache layout.

The layered layout (models/stack.init_kv_cache(layered=True)) stores one
[2, B, kv, S, D] buffer per layer instead of a single stacked
[L, 2, B, kv, S, D] array. It exists purely for performance — slicing
layer l out of the stacked buffer inside the decode loop makes XLA
materialize multi-hundred-MB copies (NOTES.md round 3) — so these tests
pin EXACT numerical equality with the stacked layout across every
production path: prefill write, lock-step decode, ring-mode decode,
per-stream scatter writes, admissions, and dp/tp sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import talker
from qwen3_tts_tpu.models.stack import (QuantKV, cache_n_layers,
                                        init_kv_cache, is_layered,
                                        stack_step)
from qwen3_tts_tpu.models.weights import (init_talker_weights,
                                          tiny_talker_config)
from qwen3_tts_tpu.runtime.generate import (admit_slots, generate_chunk,
                                            init_state, make_consts,
                                            required_ctx, required_ctx_ring)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(150), cfg)
    B = 4
    rng = np.random.default_rng(151)
    tokens = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)),
                         jnp.int32)
    lens = jnp.full((B,), 16, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    return cfg, w, prefill


@pytest.mark.parametrize("quant", [False, True])
def test_init_shapes_and_predicates(quant):
    cache = init_kv_cache(3, 2, 8, 4, 16, quant=quant, layered=True)
    assert is_layered(cache) and cache_n_layers(cache) == 3
    if quant:
        assert all(isinstance(cl, QuantKV) for cl in cache)
        assert cache[0].values.shape == (2, 2, 4, 8, 16)
        assert cache[0].scales.shape == (2, 2, 4, 8)
    else:
        assert cache[0].shape == (2, 2, 4, 8, 16)
    stacked = init_kv_cache(3, 2, 8, 4, 16, quant=quant)
    assert not is_layered(stacked) and cache_n_layers(stacked) == 3


def _stack_of(cache):
    """Collapse either layout to one [L,2,B,kv,S,D] numpy array (+scales)."""
    if is_layered(cache):
        if isinstance(cache[0], QuantKV):
            return (np.stack([np.asarray(c.values) for c in cache]),
                    np.stack([np.asarray(c.scales) for c in cache]))
        return np.stack([np.asarray(c) for c in cache]), None
    if isinstance(cache, QuantKV):
        return np.asarray(cache.values), np.asarray(cache.scales)
    return np.asarray(cache), None


@pytest.mark.parametrize("quant", [False, True])
def test_prefill_write_identical(setup, quant):
    """init_state writes bit-identical prefill K/V rows in both layouts."""
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 4, 4)
    s_stacked = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                           kv_quant=quant)
    s_layered = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                           kv_quant=quant, kv_layered=True)
    np.testing.assert_array_equal(np.asarray(s_layered.logits),
                                  np.asarray(s_stacked.logits))
    vs_l, sc_l = _stack_of(s_layered.kv_cache)
    vs_s, sc_s = _stack_of(s_stacked.kv_cache)
    np.testing.assert_array_equal(vs_l, vs_s)
    if sc_l is not None:
        np.testing.assert_array_equal(sc_l, sc_s)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("lockstep", [True, False])
def test_generate_chunk_identical(setup, quant, lockstep):
    """Lock-step and per-stream-scatter decode paths produce identical
    codes/valid/cache in both layouts (greedy, same PRNG key)."""
    cfg, w, prefill = setup
    chunk = 5
    ctx = required_ctx(prefill.prefill_embd.shape[1], chunk, chunk)

    def run(layered):
        state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                           kv_quant=quant, kv_layered=layered)
        consts = make_consts(prefill, 0.0, 1.05)
        state, codes, valid = generate_chunk(
            w, cfg, state, consts, 50, chunk, lockstep=lockstep)
        return state, np.asarray(codes), np.asarray(valid)

    st_s, codes_s, valid_s = run(False)
    st_l, codes_l, valid_l = run(True)
    np.testing.assert_array_equal(codes_l, codes_s)
    np.testing.assert_array_equal(valid_l, valid_s)
    np.testing.assert_array_equal(np.asarray(st_l.logits),
                                  np.asarray(st_s.logits))
    vs_l, sc_l = _stack_of(st_l.kv_cache)
    vs_s, sc_s = _stack_of(st_s.kv_cache)
    np.testing.assert_array_equal(vs_l, vs_s)
    if sc_l is not None:
        np.testing.assert_array_equal(sc_l, sc_s)


@pytest.mark.parametrize("quant", [False, True])
def test_ring_and_admissions_identical(setup, quant):
    """Ring-mode serving (admit_slots + masked attention + ring writes)
    matches across layouts."""
    cfg, w, prefill = setup
    B = prefill.prefill_embd.shape[0]
    chunk = 4
    ctx = required_ctx_ring(2 * chunk, chunk)

    def run(layered):
        dummy = talker.build_prefill_inputs(
            w, cfg, jnp.zeros((B, 16), jnp.int32),
            jnp.full((B,), 16, jnp.int32),
            jnp.zeros((B, cfg.hidden_size), jnp.float32))
        state = init_state(w, cfg, dummy, ctx, jax.random.PRNGKey(0),
                           active=jnp.zeros((B,), bool), kv_quant=quant,
                           kv_layered=layered)
        consts = make_consts(dummy, 0.0, 1.05)
        state, consts = admit_slots(w, cfg, state, consts,
                                    jnp.arange(B, dtype=jnp.int32), prefill)
        out = []
        for _ in range(2):
            state, codes, valid = generate_chunk(
                w, cfg, state, consts, 50, chunk, ring=True, read_ctx=ctx)
            out.append(np.asarray(codes))
        return np.concatenate(out)

    np.testing.assert_array_equal(run(True), run(False))


@pytest.mark.parametrize("quant", [False, True])
def test_stack_step_per_stream_scatter_identical(quant):
    """Direct stack_step with per-stream write slots (write_idx=[B])."""
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(152), cfg)
    B, S = 4, 32
    rng = np.random.default_rng(153)
    x = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)), jnp.float32)
    write_idx = jnp.asarray([3, 7, 1, 5], jnp.int32)
    n_valid = write_idx + 1
    kwargs = dict(n_heads=cfg.n_attention_heads,
                  n_kv=cfg.n_key_value_heads, head_dim=cfg.head_dim,
                  eps=cfg.rms_norm_eps, theta=cfg.rope_theta)

    def run(layered):
        cache = init_kv_cache(cfg.n_layers, B, S, cfg.n_key_value_heads,
                              cfg.head_dim, quant=quant, layered=layered)
        y, cache = stack_step(w["layers"], x, write_idx, cache, write_idx,
                              n_valid, **kwargs)
        return np.asarray(y), _stack_of(cache)

    y_s, (vs_s, sc_s) = run(False)
    y_l, (vs_l, sc_l) = run(True)
    np.testing.assert_array_equal(y_l, y_s)
    np.testing.assert_array_equal(vs_l, vs_s)
    if sc_l is not None:
        np.testing.assert_array_equal(sc_l, sc_s)


@pytest.mark.parametrize("quant", [False, True])
def test_sharded_layered_matches_single(setup, quant):
    """Layered cache under dp=4 x tp=2: shard_gen_state places per-layer
    buffers and generation equals the unsharded run."""
    from qwen3_tts_tpu.parallel.mesh import (make_mesh, shard_consts,
                                             shard_gen_state,
                                             shard_talker_weights)
    cfg, w, prefill = setup
    chunk = 4
    ctx = required_ctx(prefill.prefill_embd.shape[1], chunk, chunk)

    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                       kv_quant=quant, kv_layered=True)
    consts = make_consts(prefill, 0.0, 1.05)
    _, base_codes, base_valid = generate_chunk(w, cfg, state, consts, 50,
                                               chunk, lockstep=True)

    mesh = make_mesh(4, 2)
    w_s = shard_talker_weights(w, mesh, cfg)
    state = init_state(w_s, cfg, prefill, ctx, jax.random.PRNGKey(0),
                       kv_quant=quant, kv_layered=True)
    state = shard_gen_state(state, mesh)
    assert is_layered(state.kv_cache)
    consts = shard_consts(make_consts(prefill, 0.0, 1.05), mesh)
    _, codes, valid = generate_chunk(w_s, cfg, state, consts, 50, chunk,
                                     lockstep=True)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(base_codes))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(base_valid))


@pytest.mark.parametrize("layered", [False, True])
def test_admit_duplicate_slots_last_wins(setup, layered):
    """admit_slots' contract: duplicate slot entries resolve last-wins
    (serving pads K to a fixed shape by repeating admissions). The
    layered path writes via one scatter per layer after an on-device
    payload dedup; this pins the ordering semantics for both layouts by
    admitting two DIFFERENT requests to the same slot."""
    cfg, w, prefill = setup
    B = prefill.prefill_embd.shape[0]
    chunk = 4
    ctx = required_ctx_ring(2 * chunk, chunk)
    rng = np.random.default_rng(160)
    tokens2 = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)),
                          jnp.int32)
    prefill2 = talker.build_prefill_inputs(
        w, cfg, tokens2, jnp.full((B,), 16, jnp.int32),
        jnp.zeros((B, cfg.hidden_size), jnp.float32))

    def base_state():
        dummy = talker.build_prefill_inputs(
            w, cfg, jnp.zeros((B, 16), jnp.int32),
            jnp.full((B,), 16, jnp.int32),
            jnp.zeros((B, cfg.hidden_size), jnp.float32))
        state = init_state(w, cfg, dummy, ctx, jax.random.PRNGKey(0),
                           active=jnp.zeros((B,), bool),
                           kv_layered=layered)
        return state, make_consts(dummy, 0.0, 1.05)

    two = jax.tree.map(
        lambda a, b: jnp.concatenate([a[:1], b[:1]]), prefill, prefill2)

    # duplicate writes to slot 0: prefill row then prefill2 row (last wins)
    state, consts = base_state()
    state, consts = admit_slots(w, cfg, state, consts,
                                jnp.asarray([0, 0], jnp.int32), two)

    # reference: admit only the LAST entry
    ref_state, ref_consts = base_state()
    one = jax.tree.map(lambda a: a[1:], two)
    ref_state, ref_consts = admit_slots(w, cfg, ref_state, ref_consts,
                                        jnp.asarray([0], jnp.int32), one)

    _, codes, _ = generate_chunk(w, cfg, state, consts, 50, chunk,
                                 ring=True, read_ctx=ctx)
    _, ref_codes, _ = generate_chunk(w, cfg, ref_state, ref_consts, 50,
                                     chunk, ring=True, read_ctx=ctx)
    np.testing.assert_array_equal(np.asarray(codes)[:, 0],
                                  np.asarray(ref_codes)[:, 0])


def test_pipeline_env_flag_layered(monkeypatch):
    """QWEN3_TTS_CACHE=layered routes the full pipeline through per-layer
    cache buffers (with int8 on top) and matches the stacked output."""
    import dataclasses

    from qwen3_tts_tpu.models import vocoder as voc_mod
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from .test_tokenizer import make_tiny_tokenizer

    rng = np.random.default_rng(161)
    cfg = tiny_talker_config()
    w = init_talker_weights(rng, cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    engine = Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                      voc_cfg, voc_w)
    p = TTSParams(max_audio_tokens=6, temperature=0.0,
                  print_timing=False, seed=0)
    base = engine.synthesize("hello world.", p)
    monkeypatch.setenv("QWEN3_TTS_CACHE", "layered")
    monkeypatch.setenv("QWEN3_TTS_KV", "int8")
    got = engine.synthesize("hello world.", p)
    assert got.success
    assert abs(got.n_frames - base.n_frames) <= 1
    assert len(got.audio) > 0


def test_serving_env_flag_layered(monkeypatch):
    """ContinuousBatcher under QWEN3_TTS_CACHE=layered completes requests
    and produces the same frame counts as the stacked run (greedy)."""
    import dataclasses

    from qwen3_tts_tpu.models import vocoder as voc_mod
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from qwen3_tts_tpu.runtime.serve import ContinuousBatcher
    from .test_tokenizer import make_tiny_tokenizer

    rng = np.random.default_rng(162)
    cfg = tiny_talker_config()
    w = init_talker_weights(rng, cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    engine = Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                      voc_cfg, voc_w)
    params = TTSParams(temperature=0.0, top_k=50, print_timing=False,
                       seed=0)

    def run():
        cb = ContinuousBatcher(engine, n_slots=2, params=params,
                               max_frames=12)
        r1 = cb.submit("hello world.")
        r2 = cb.submit("hello.")
        results = cb.run_all()
        assert all(r.success for r in results.values())
        return [results[r1].n_frames, results[r2].n_frames]

    base = run()
    monkeypatch.setenv("QWEN3_TTS_CACHE", "layered")
    got = run()
    assert got == base
