"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import talker
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.parallel.mesh import (
    make_mesh, shard_consts, shard_gen_state, shard_talker_weights)
from qwen3_tts_tpu.runtime.generate import (
    generate_chunk, init_state, make_consts, required_ctx)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(61), cfg)
    B = 8
    rng = np.random.default_rng(62)
    tokens = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)),
                         jnp.int32)
    lens = jnp.full((B,), 16, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    return cfg, w, prefill


def _run(cfg, w, prefill, chunk=4):
    ctx = required_ctx(prefill.prefill_embd.shape[1], chunk, chunk)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    consts = make_consts(prefill, 0.0, 1.05)
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, chunk)
    return np.asarray(codes), np.asarray(valid)


def test_dp_sharded_matches_single(setup):
    """Greedy generation over a dp=8 mesh must equal the single-device
    result — pure data parallelism, no cross-stream interaction."""
    cfg, w, prefill = setup
    base_codes, base_valid = _run(cfg, w, prefill)

    mesh = make_mesh(8, 1)
    w_s = shard_talker_weights(w, mesh)
    ctx = required_ctx(prefill.prefill_embd.shape[1], 4, 4)
    state = init_state(w_s, cfg, prefill, ctx, jax.random.PRNGKey(0))
    state = shard_gen_state(state, mesh)
    consts = shard_consts(make_consts(prefill, 0.0, 1.05), mesh)
    state, codes, valid = generate_chunk(w_s, cfg, state, consts, 50, 4)

    np.testing.assert_array_equal(np.asarray(codes), base_codes)
    np.testing.assert_array_equal(np.asarray(valid), base_valid)


def test_dp_tp_sharded_matches_single(setup):
    """dp=4 x tp=2: Megatron-style head/FFN sharding of the talker must be
    numerically equivalent (GSPMD inserts the collectives)."""
    cfg, w, prefill = setup
    base_codes, base_valid = _run(cfg, w, prefill)

    mesh = make_mesh(4, 2)
    w_s = shard_talker_weights(w, mesh, cfg)
    ctx = required_ctx(prefill.prefill_embd.shape[1], 4, 4)
    state = init_state(w_s, cfg, prefill, ctx, jax.random.PRNGKey(0))
    state = shard_gen_state(state, mesh)
    consts = shard_consts(make_consts(prefill, 0.0, 1.05), mesh)
    state, codes, valid = generate_chunk(w_s, cfg, state, consts, 50, 4)

    np.testing.assert_array_equal(np.asarray(codes), base_codes)
    np.testing.assert_array_equal(np.asarray(valid), base_valid)


def test_tp_projections_actually_sharded(setup):
    """tp>1 must unfuse wqkv/w_gu and column-shard every projection on
    'tp' — not replicate the fused tensors (round-1 gap)."""
    cfg, w, prefill = setup
    mesh = make_mesh(4, 2)
    w_s = shard_talker_weights(w, mesh, cfg)
    for stack in (w_s["layers"], w_s["code_pred"]["layers"]):
        assert "wqkv" not in stack and "w_gu" not in stack
        for name in ("wq", "wk", "wv", "w_gate", "w_up"):
            spec = stack[name].sharding.spec
            assert "tp" in tuple(spec), (name, spec)
        for name in ("wo", "w_down"):
            spec = stack[name].sharding.spec
            assert "tp" in tuple(spec), (name, spec)
    # and per-shard sizes actually halve the projection bytes
    wq = w_s["layers"]["wq"]
    shard = next(iter(wq.addressable_shards))
    assert shard.data.shape[-1] == wq.shape[-1] // 2


def test_tp_requires_cfg(setup):
    cfg, w, prefill = setup
    mesh = make_mesh(4, 2)
    with pytest.raises(ValueError, match="cfg"):
        shard_talker_weights(w, mesh)


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 1)


def test_pipeline_sharded_matches_single():
    """Full pipeline (synthesize_batch) over a dp=8 mesh equals the
    unsharded engine output (greedy)."""
    import dataclasses
    from qwen3_tts_tpu.models import vocoder as voc_mod
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from .test_tokenizer import make_tiny_tokenizer

    rng = np.random.default_rng(110)
    cfg = tiny_talker_config()
    w = init_talker_weights(rng, cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    p = TTSParams(max_audio_tokens=8, temperature=0.0,
                  print_timing=False, seed=0)
    texts = ["hello world."] * 8

    base_engine = Qwen3TTS.from_components(
        make_tiny_tokenizer(), cfg, w, voc_cfg, voc_w)
    base = base_engine.synthesize_batch(texts, None, p)

    sharded = Qwen3TTS.from_components(
        make_tiny_tokenizer(), cfg, w, voc_cfg, voc_w)
    sharded.shard(make_mesh(8, 1))
    got = sharded.synthesize_batch(texts, None, p)

    for a, b in zip(base, got):
        assert a.success and b.success
        assert a.n_frames == b.n_frames
        np.testing.assert_allclose(a.audio, b.audio, atol=1e-3)


# ---------------------------------------------------------------------------
# SERVING path on the mesh: admissions, ring-mode chunks, park (round-3:
# the continuous-batching primitives must run SPMD, not just lock-step)
# ---------------------------------------------------------------------------

def _serving_roundtrip(cfg, w, mesh=None):
    """Drive the serving primitives: dummy init (all parked) -> admit 8
    requests -> 2 ring chunks -> park slot 0 -> 1 more chunk."""
    from qwen3_tts_tpu.parallel.mesh import shard_consts, shard_gen_state
    from qwen3_tts_tpu.runtime.generate import (
        admit_slots, park_slot, required_ctx_ring)

    B, chunk = 8, 4
    rng = np.random.default_rng(77)
    tokens = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)),
                         jnp.int32)
    lens = jnp.full((B,), 16, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    ctx = required_ctx_ring(3 * chunk, chunk)

    dummy = talker.build_prefill_inputs(
        w, cfg, jnp.zeros((B, 16), jnp.int32), lens, spk)
    state = init_state(w, cfg, dummy, ctx, jax.random.PRNGKey(0),
                       active=jnp.zeros((B,), bool))
    consts = make_consts(dummy, 0.0, 1.05)
    if mesh is not None:
        state = shard_gen_state(state, mesh)
        consts = shard_consts(consts, mesh)

    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    state, consts = admit_slots(w, cfg, state, consts,
                                jnp.arange(B, dtype=jnp.int32), prefill)
    out = []
    for _ in range(2):
        state, codes, valid = generate_chunk(w, cfg, state, consts, 50,
                                             chunk, ring=True,
                                             read_ctx=ctx)
        out.append((np.asarray(codes), np.asarray(valid)))
    state = park_slot(state, jnp.int32(0))
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, chunk,
                                         ring=True, read_ctx=ctx)
    out.append((np.asarray(codes), np.asarray(valid)))
    assert not np.asarray(valid)[:, 0].any()  # parked slot emits nothing
    return out, np.asarray(state.done)


def test_serving_path_dp_sharded_matches_single(setup):
    """admit_slots + ring-mode chunks + park over dp=8 must be bit-equal
    to single-device (the serving state is explicitly dp-sharded)."""
    cfg, w, _ = setup
    base, base_done = _serving_roundtrip(cfg, w, None)

    mesh = make_mesh(8, 1)
    w_s = shard_talker_weights(w, mesh)
    got, got_done = _serving_roundtrip(cfg, w_s, mesh)
    for (bc, bv), (gc, gv) in zip(base, got):
        np.testing.assert_array_equal(gc, bc)
        np.testing.assert_array_equal(gv, bv)
    np.testing.assert_array_equal(got_done, base_done)


def test_serving_path_dp_tp_sharded_matches_single(setup):
    """Same over dp=4 x tp=2 (Megatron-sharded talker + code predictor)."""
    cfg, w, _ = setup
    base, base_done = _serving_roundtrip(cfg, w, None)

    mesh = make_mesh(4, 2)
    w_s = shard_talker_weights(w, mesh, cfg)
    got, got_done = _serving_roundtrip(cfg, w_s, mesh)
    for (bc, bv), (gc, gv) in zip(base, got):
        np.testing.assert_array_equal(gc, bc)
        np.testing.assert_array_equal(gv, bv)
    np.testing.assert_array_equal(got_done, base_done)


def test_continuous_batcher_on_mesh_matches_single():
    """ContinuousBatcher over a sharded engine (dp=4 x tp=2) produces the
    same greedy results as the unsharded engine — the full serving stack
    (admissions, ring cache, retires, vocoder) under SPMD."""
    import dataclasses
    from qwen3_tts_tpu.models import vocoder as voc_mod
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from qwen3_tts_tpu.runtime.serve import ContinuousBatcher
    from .test_tokenizer import make_tiny_tokenizer

    rng = np.random.default_rng(120)
    cfg = tiny_talker_config()
    w = init_talker_weights(rng, cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    p = TTSParams(temperature=0.0, print_timing=False, seed=0)
    texts = ["hello world.", "hello.", "hello hello.", "hello world. hello."]

    def run(engine):
        cb = ContinuousBatcher(engine, n_slots=4, params=p, max_frames=8)
        rids = [cb.submit(t) for t in texts]
        res = cb.run_all()
        return [res[r] for r in rids]

    base = run(Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                        voc_cfg, voc_w))
    sharded_engine = Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                              voc_cfg, voc_w)
    sharded_engine.shard(make_mesh(4, 2))
    got = run(sharded_engine)
    for a, b in zip(base, got):
        assert a.success and b.success
        assert a.n_frames == b.n_frames
        np.testing.assert_allclose(b.audio, a.audio, atol=1e-3)


def test_ragged_batch_warns_and_stays_correct(setup, capfd):
    """B % dp != 0 can't take the explicit dp state layout; the engine
    must SAY so (one stderr line) instead of silently degrading to
    GSPMD propagation — and the output must still be right (equal to
    the unsharded engine on the same inputs)."""
    import dataclasses

    from qwen3_tts_tpu.models import vocoder as voc_mod
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from .test_tokenizer import make_tiny_tokenizer

    cfg, w, _ = setup
    rng = np.random.default_rng(63)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    texts = ["hello.", "hello world.", "hello hello."]   # 3 % 8 != 0
    params = TTSParams(max_audio_tokens=8, temperature=0.0,
                       print_timing=False, print_progress=False, seed=0)

    base_engine = Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                           voc_cfg, voc_w)
    base = base_engine.synthesize_batch(texts, None, params)
    capfd.readouterr()

    mesh = make_mesh(8, 1)
    engine = Qwen3TTS.from_components(make_tiny_tokenizer(), cfg, w,
                                      voc_cfg, voc_w).shard(mesh)
    got = engine.synthesize_batch(texts, None, params)
    err = capfd.readouterr().err
    assert "not divisible by dp=8" in err
    for b, g in zip(base, got):
        assert g.success
        np.testing.assert_array_equal(
            np.asarray(g.audio), np.asarray(b.audio))
