"""Generation-loop unit tests: EOS handling, masks, determinism, chunking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.models import talker
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.ops.sampling import sample_cb0, apply_top_k, NEG_INF
from qwen3_tts_tpu.runtime.generate import (
    generate_chunk, init_state, make_consts, required_ctx)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_talker_config()
    w = init_talker_weights(np.random.default_rng(71), cfg)
    B = 2
    rng = np.random.default_rng(72)
    tokens = jnp.asarray(rng.integers(0, cfg.text_vocab_size, (B, 16)), jnp.int32)
    lens = jnp.full((B,), 16, jnp.int32)
    spk = jnp.zeros((B, cfg.hidden_size), jnp.float32)
    prefill = talker.build_prefill_inputs(w, cfg, tokens, lens, spk)
    return cfg, w, prefill


def test_chunk_shapes_and_chaining(setup):
    cfg, w, prefill = setup
    P = prefill.prefill_embd.shape[1]
    ctx = required_ctx(P, 8, 4)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    consts = make_consts(prefill, 0.0, 1.05)
    np.testing.assert_array_equal(np.asarray(state.n_past), [P, P])
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, 4)
    assert codes.shape == (4, 2, cfg.n_codebooks)
    assert valid.shape == (4, 2)
    # per-stream positions advance while the stream is live
    n_past = np.asarray(state.n_past)
    frame_idx = np.asarray(state.frame_idx)
    done = np.asarray(state.done)
    for b in range(2):
        if not done[b]:
            assert n_past[b] == P + 4
            assert frame_idx[b] == 4
        else:
            assert n_past[b] <= P + 4
    # chaining another chunk keeps advancing live streams
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, 4)
    n_past2 = np.asarray(state.n_past)
    assert np.all(n_past2 >= n_past)
    assert np.all(n_past2 <= P + 8)


def test_valid_false_after_eos(setup):
    """Once EOS is sampled, the stream emits no further valid frames."""
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 80, 40)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    consts = make_consts(prefill, 0.0, 1.05)
    all_valid = []
    for _ in range(2):
        state, codes, valid = generate_chunk(w, cfg, state, consts, 50, 40)
        all_valid.append(np.asarray(valid))
    v = np.concatenate(all_valid, axis=0)  # [80, B]
    for b in range(v.shape[1]):
        # valid must be a prefix property: no True after the first False
        seen_false = False
        for t in range(v.shape[0]):
            if not v[t, b]:
                seen_false = True
            assert not (seen_false and v[t, b])
    # EOS ramp (expected_frames = max(20, 16*4) = 64) forces EOS by frame 80
    # for greedy sampling with random weights... check done flags advanced
    assert np.asarray(state.done).dtype == bool


def test_eos_ramp_forces_termination(setup):
    """The EOS ramp-boost guarantees greedy generation terminates within
    ~2x expected_frames (tts_transformer.cpp:2439-2445: by
    frame >= 2*expected, EOS logit == max+5)."""
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 160, 40)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    consts = make_consts(prefill, 0.0, 1.05)
    for _ in range(4):  # 160 frames >> 2*64
        state, codes, valid = generate_chunk(w, cfg, state, consts, 50, 40)
        if bool(np.all(np.asarray(state.done))):
            break
    assert bool(np.all(np.asarray(state.done)))


def test_inactive_streams_stay_done(setup):
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 4, 4)
    state = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0),
                       active=jnp.array([True, False]))
    consts = make_consts(prefill, 0.0, 1.05)
    state, codes, valid = generate_chunk(w, cfg, state, consts, 50, 4)
    assert not np.any(np.asarray(valid)[:, 1])


def test_sample_cb0_suppression_and_eos_ramp():
    V = 3072
    eos = 2150
    B = 1
    logits = jnp.zeros((B, V), jnp.float32)
    # put the max in the suppressed zone (!= eos): must never be sampled
    logits = logits.at[0, 3000].set(100.0)
    seen = jnp.zeros((B, V), bool)
    tok = sample_cb0(logits, seen, jnp.int32(0), jnp.array([100]),
                     jnp.float32(1.0), jnp.float32(0.0), 50,
                     jax.random.PRNGKey(0), eos_id=eos, suppress_start=2048)
    assert int(tok[0]) != 3000
    assert int(tok[0]) < 2048 or int(tok[0]) == eos

    # far past expected_frames the ramp pins EOS to max+5 -> greedy = EOS
    tok = sample_cb0(logits, seen, jnp.int32(200), jnp.array([100]),
                     jnp.float32(1.0), jnp.float32(0.0), 50,
                     jax.random.PRNGKey(0), eos_id=eos, suppress_start=2048)
    assert int(tok[0]) == eos


def test_sample_cb0_repetition_penalty():
    V = 3072
    eos = 2150
    logits = jnp.zeros((1, V), jnp.float32)
    logits = logits.at[0, 5].set(1.0)    # best
    logits = logits.at[0, 7].set(0.99)   # runner-up
    seen = jnp.zeros((1, V), bool).at[0, 5].set(True)
    # penalty 2.0 halves the positive logit of the seen token: 0.5 < 0.99
    tok = sample_cb0(logits, seen, jnp.int32(0), jnp.array([100]),
                     jnp.float32(2.0), jnp.float32(0.0), 50,
                     jax.random.PRNGKey(0), eos_id=eos, suppress_start=2048)
    assert int(tok[0]) == 7


def test_apply_top_k_threshold_ties():
    logits = jnp.asarray([[5.0, 4.0, 4.0, 1.0, 0.0]])
    out = apply_top_k(logits, 2)
    # ties at the threshold (4.0) all survive — reference semantics
    # (tts_transformer.cpp:2466-2471)
    got = np.asarray(out[0])
    assert got[0] == 5.0 and got[1] == 4.0 and got[2] == 4.0
    assert got[3] == NEG_INF and got[4] == NEG_INF
    # disabled cases
    np.testing.assert_array_equal(np.asarray(apply_top_k(logits, 0)),
                                  np.asarray(logits))
    np.testing.assert_array_equal(np.asarray(apply_top_k(logits, 5)),
                                  np.asarray(logits))


def test_eos_survives_top_k():
    """EOS keeps its (post-temperature) logit even when filtered by top-k
    (tts_transformer.cpp:2455-2475)."""
    V = 3072
    eos = 2150
    logits = jnp.full((1, V), 0.0, jnp.float32)
    for i in range(60):
        logits = logits.at[0, i].set(10.0)  # top-50 all in [0,60)
    logits = logits.at[0, eos].set(5.0)     # below top-k threshold
    seen = jnp.zeros((1, V), bool)
    # With temperature>0, sampling distribution must still include EOS.
    # Draw many samples; EOS probability is tiny but its logit must not be
    # -inf — verify via the internals: run with temperature so low that
    # only the max survives, then boost EOS above the others via the ramp.
    tok = sample_cb0(logits, seen, jnp.int32(1000), jnp.array([10]),
                     jnp.float32(1.0), jnp.float32(0.1), 50,
                     jax.random.PRNGKey(1), eos_id=eos, suppress_start=2048)
    assert int(tok[0]) == eos


def test_read_ctx_bucketing_equivalence(setup):
    """Bucketed attention read window must not change outputs."""
    from qwen3_tts_tpu.runtime.generate import ctx_bucket
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 64, 8, align=128)
    state_a = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    state_b = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    consts = make_consts(prefill, 0.0, 1.05)
    a = generate_chunk(w, cfg, state_a, consts, 50, 8)[1]
    rb = ctx_bucket(int(np.asarray(state_b.n_past).max()), 8, ctx, bucket=32)
    assert rb < ctx  # the bucket actually narrows the window
    b = generate_chunk(w, cfg, state_b, consts, 50, 8, read_ctx=rb)[1]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lockstep_write_equivalence(setup):
    """Scalar lock-step KV write must match per-stream writes while all
    streams are live (greedy)."""
    cfg, w, prefill = setup
    ctx = required_ctx(prefill.prefill_embd.shape[1], 8, 8)
    state_a = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    state_b = init_state(w, cfg, prefill, ctx, jax.random.PRNGKey(0))
    consts = make_consts(prefill, 0.0, 1.05)
    a = generate_chunk(w, cfg, state_a, consts, 50, 8)[1]
    b = generate_chunk(w, cfg, state_b, consts, 50, 8, lockstep=True)[1]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ctx_bucket_math():
    from qwen3_tts_tpu.runtime.generate import ctx_bucket
    assert ctx_bucket(10, 40, 4224) == 512
    assert ctx_bucket(500, 40, 4224) == 1024
    assert ctx_bucket(4200, 40, 4224) == 4224  # capped at allocated ctx
    assert ctx_bucket(0, 40, 256) == 256
