"""Continuous-batching serving engine tests."""

import dataclasses

import numpy as np
import pytest

from qwen3_tts_tpu.models import vocoder as voc_mod
from qwen3_tts_tpu.models.weights import init_talker_weights, tiny_talker_config
from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
from qwen3_tts_tpu.runtime.serve import ContinuousBatcher

from .test_tokenizer import make_tiny_tokenizer


@pytest.fixture(scope="module")
def engine():
    rng = np.random.default_rng(90)
    talker_cfg = tiny_talker_config()
    talker_w = init_talker_weights(rng, talker_cfg)
    voc_cfg = dataclasses.replace(voc_mod.tiny_vocoder_config(),
                                  codebook_size=2048)
    voc_w = voc_mod.init_vocoder_weights(rng, voc_cfg)
    return Qwen3TTS.from_components(make_tiny_tokenizer(), talker_cfg,
                                    talker_w, voc_cfg, voc_w)


def _params():
    return TTSParams(temperature=0.0, top_k=50, print_timing=False, seed=0)


def test_two_requests_complete(engine):
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=12)
    r1 = cb.submit("hello world.")
    r2 = cb.submit("hello.")
    results = cb.run_all()
    assert set(results) == {r1, r2}
    for r in results.values():
        assert r.success
        assert r.n_frames >= 1
        assert len(r.audio) > 0


def test_more_requests_than_slots(engine):
    """Queued requests admit into freed slots — 5 requests over 2 slots."""
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=8)
    rids = [cb.submit(f"hello world.") for _ in range(5)]
    results = cb.run_all()
    assert set(results) == set(rids)
    assert all(r.success for r in results.values())


def test_continuous_matches_lockstep_greedy(engine):
    """A request admitted to a continuous batch must produce the same
    greedy frames as standalone synthesis (slot isolation)."""
    base = engine.synthesize(
        "hello world.", TTSParams(max_audio_tokens=12, temperature=0.0,
                                  print_timing=False, seed=0))
    cb = ContinuousBatcher(engine, n_slots=3, params=_params(), max_frames=12)
    rid = cb.submit("hello world.")
    res = cb.run_all()[rid]
    assert res.n_frames == base.n_frames
    np.testing.assert_allclose(res.audio, base.audio, atol=1e-3)


def test_late_join_isolation(engine):
    """A request admitted mid-flight (after another stream has generated
    chunks) must still match its standalone output."""
    p = _params()
    base = engine.synthesize(
        "hello.", TTSParams(max_audio_tokens=8, temperature=0.0,
                            print_timing=False, seed=0))
    cb = ContinuousBatcher(engine, n_slots=2, params=p, max_frames=8)
    cb.submit("hello world. hello world. hello world.")
    cb.step()  # first stream runs a chunk alone
    rid2 = cb.submit("hello.")
    results = cb.run_all()
    res = results[rid2]
    assert res.n_frames == base.n_frames
    np.testing.assert_allclose(res.audio, base.audio, atol=1e-3)


def test_slot_reuse_after_frame_cap(engine):
    """A slot retired by its frame cap (not EOS) must be parked on-device
    and a reused slot must still match standalone output.

    With max_frames=4 the ring region (required_ctx_ring(4,40)=128, ~112
    ring slots) wraps every ~3 chunks, so 7 sequential requests exercise
    multiple ring wraparounds — each must still match standalone."""
    p = _params()
    base = engine.synthesize(
        "hello world.", TTSParams(max_audio_tokens=4, temperature=0.0,
                                  print_timing=False, seed=0))
    cb = ContinuousBatcher(engine, n_slots=1, params=p, max_frames=4)
    rids = [cb.submit("hello world.") for _ in range(7)]
    results = cb.run_all()
    for rid in rids:
        res = results[rid]
        assert res.n_frames == base.n_frames
        np.testing.assert_allclose(res.audio, base.audio, atol=1e-3)


def test_long_text_matches_standalone(engine):
    """A text whose trailing schedule exceeds the default 256-row buffer
    must NOT be silently truncated: the shared buffer grows to the next
    bucket and the continuous output matches standalone synthesis
    (reference handles arbitrary-length trailing schedules,
    tts_transformer.cpp:1214-1228)."""
    text = "hello world. " * 60  # ~420 text tokens -> trailing > 256
    n_tok = len(engine.tokenizer.encode_for_tts(text))
    assert n_tok > 260, f"test text too short ({n_tok} tokens)"
    max_frames = 280
    base = engine.synthesize(
        text, TTSParams(max_audio_tokens=max_frames, temperature=0.0,
                        print_timing=False, seed=0))
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(),
                           max_frames=max_frames)
    rid = cb.submit(text)
    res = cb.run_all()[rid]
    # the shared buffer grew at admission (submission only enqueues)
    assert cb.trailing_buf >= min(n_tok - 9, max_frames)
    assert res.n_frames == base.n_frames
    np.testing.assert_allclose(res.audio, base.audio, atol=1e-3)


def test_warmup_then_serve(engine):
    """warmup() precompiles the serving executables and must leave a
    pristine state: results afterwards match a non-warmed batcher."""
    base = engine.synthesize(
        "hello world.", TTSParams(max_audio_tokens=8, temperature=0.0,
                                  print_timing=False, seed=0))
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=8)
    cb.warmup()
    assert not cb.pending()
    rid = cb.submit("hello world.")
    res = cb.run_all()[rid]
    assert res.n_frames == base.n_frames
    np.testing.assert_allclose(res.audio, base.audio, atol=1e-3)


def test_streaming_callback(engine):
    got = []
    cb = ContinuousBatcher(engine, n_slots=1, params=_params(), max_frames=6)
    cb.submit("hello world.", on_audio=lambda a, final: got.append((len(a), final)))
    results = cb.run_all()
    assert got, "on_audio never fired"
    assert got[-1][1] is True  # final chunk flagged
    total = sum(n for n, _ in got)
    assert total == len(list(results.values())[0].audio)


# ---------------------------------------------------------------------------
# Failure isolation (the multi-stream extension of the reference's
# graceful-degradation policy, SURVEY.md §5)
# ---------------------------------------------------------------------------

def test_poisoned_callback_fails_only_its_request(engine):
    """A raising on_audio sink fails ITS request; concurrent streams and
    later requests are unaffected."""
    def bad_sink(a, final):
        raise RuntimeError("sink exploded")

    cb = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=6)
    r_bad = cb.submit("hello world.", on_audio=bad_sink)
    r_ok = cb.submit("hello.")
    results = cb.run_all()
    assert not results[r_bad].success
    assert "sink exploded" in results[r_bad].error_msg
    assert results[r_ok].success
    # the batcher keeps serving afterwards
    r_next = cb.submit("hello world.")
    assert cb.run_all()[r_next].success


def test_step_failure_fails_inflight_not_process(engine, monkeypatch):
    """An unexpected raise inside the shared device step fails the
    in-flight requests with error results, resets the device state, and
    the batcher continues to serve new requests."""
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=6)
    r1 = cb.submit("hello world.")
    r2 = cb.submit("hello.")

    real = cb._decode_slots
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("device fell over")

    monkeypatch.setattr(cb, "_decode_slots", boom)
    out = {}
    # drive until the injected failure surfaces (first step with decode work)
    for _ in range(4):
        out.update(cb.step())
        if out:
            break
    assert calls["n"] >= 1
    assert set(out) == {r1, r2}
    assert all(not r.success for r in out.values())
    assert all("device fell over" in r.error_msg for r in out.values())
    assert not cb.pending()

    # recovery: the rebuilt state serves new requests correctly
    monkeypatch.setattr(cb, "_decode_slots", real)
    base = engine.synthesize(
        "hello world.", TTSParams(max_audio_tokens=6, temperature=0.0,
                                  print_timing=False, seed=0))
    r3 = cb.submit("hello world.")
    res = cb.run_all()[r3]
    assert res.success
    assert res.n_frames == base.n_frames
    np.testing.assert_allclose(res.audio, base.audio, atol=1e-3)


def test_queued_requests_survive_step_failure(engine, monkeypatch):
    """Requests still in the host queue when a step fails are NOT failed:
    they admit into the rebuilt state and complete."""
    cb = ContinuousBatcher(engine, n_slots=1, params=_params(), max_frames=6)
    r1 = cb.submit("hello world.")
    r2 = cb.submit("hello.")  # waits in queue behind r1

    real = cb._dispatch_chunk
    fired = {"done": False}

    def boom_once(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            raise RuntimeError("transient")
        return real(*a, **k)

    # fail the FIRST chunk dispatch: r1 is in flight, r2 still queued
    monkeypatch.setattr(cb, "_dispatch_chunk", boom_once)
    results = cb.run_all()
    assert set(results) == {r1, r2}
    assert not results[r1].success
    assert results[r2].success


def test_aot_artifacts_reload_across_batchers(engine, tmp_path, monkeypatch):
    """A second batcher over the SAME AOT dir deserializes the serving
    executables instead of compiling and produces identical greedy
    output — the reference's prebuilt-engine reload semantics
    (trt_vocoder.cpp:26-96) at the serving layer."""
    from qwen3_tts_tpu.runtime.aot import AotCache

    # fresh engine-level cache pointed at tmp_path
    monkeypatch.setattr(engine, "_aot_cache", AotCache(tmp_path), raising=False)
    monkeypatch.setattr(engine, "_voc_execs", {}, raising=False)
    cb1 = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=8)
    r1 = cb1.submit("hello world.")
    out1 = cb1.run_all()
    arts = list(tmp_path.glob("*.jaxexec"))
    assert arts, "no AOT artifacts were persisted by the serving path"
    names = {p.name.split("-")[0] for p in arts}
    assert "gen" in names and "admit" in names and "voc" in names

    # second batcher: same dir, FRESH AotCache (a fresh cache instance
    # models a new process — the in-process memo on the first instance
    # would otherwise serve live executables without touching disk)
    # -> loads, never compiles anew
    monkeypatch.setattr(engine, "_aot_cache", AotCache(tmp_path), raising=False)
    monkeypatch.setattr(engine, "_voc_execs", {}, raising=False)
    loads = []
    orig_load = AotCache.load
    def counting_load(self, key):
        fn = orig_load(self, key)
        loads.append((key, fn is not None))
        return fn
    monkeypatch.setattr(AotCache, "load", counting_load)
    cb2 = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=8)
    r2 = cb2.submit("hello world.")
    out2 = cb2.run_all()
    assert loads and all(hit for _, hit in loads), loads
    np.testing.assert_array_equal(out1[r1].audio, out2[r2].audio)


def test_streaming_final_fires_exactly_once(engine):
    """A stream whose frame count is an exact CHUNK_FRAMES multiple must
    still get exactly one final=True callback (retire at the 40-frame
    cap; the old code only flagged ragged tails)."""
    got = []
    cb = ContinuousBatcher(engine, n_slots=1, params=_params(),
                           max_frames=40)
    cb.submit("hello world. " * 10,
              on_audio=lambda a, final: got.append((len(a), final)))
    results = cb.run_all()
    assert list(results.values())[0].success
    finals = [f for _, f in got]
    assert sum(finals) == 1 and finals[-1] is True


def test_bad_embedding_fails_only_its_request(engine):
    """A wrong-shape speaker embedding fails ITS request; the concurrent
    stream completes (the old path raised outside the per-request guard
    and took down the whole in-flight batch)."""
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(),
                           max_frames=8)
    r_bad = cb.submit("hello world.", embedding=np.zeros(7, np.float32))
    r_ok = cb.submit("hello.")
    results = cb.run_all()
    assert not results[r_bad].success
    assert "embedding" in results[r_bad].error_msg
    assert results[r_ok].success


def test_warmup_long_token_bucket(engine):
    """warmup() must grow the trailing buffer exactly like the live
    admission path; warming a long-text bucket used to crash on the
    _pad_trailing capacity assert."""
    cb = ContinuousBatcher(engine, n_slots=1, params=_params(),
                           max_frames=32, trailing_buf=16)
    cb.warmup(token_buckets=(64,))
    assert cb.trailing_buf >= 32  # grew (capped at max_frames)
    r = cb.submit("hello.")
    assert cb.run_all()[r].success


def test_continuous_honors_max_audio_tokens(engine):
    """params.max_audio_tokens (the CLI's --max-tokens) caps continuous-
    mode requests too — it used to be silently ignored there (only the
    batcher-level max_frames bound generation)."""
    p = TTSParams(max_audio_tokens=6, temperature=0.0,
                  print_timing=False, seed=0)
    cb = ContinuousBatcher(engine, n_slots=2, params=p, max_frames=100)
    assert cb.max_frames == 6
    rid = cb.submit("hello world.")
    res = cb.run_all()[rid]
    assert res.success and res.n_frames <= 6


def test_queue_wait_recorded(engine):
    """t_queue_ms: ~0 for requests admitted straight into free slots,
    positive for requests that waited behind a full batcher (TTFA
    accounting in tools/bench_serve.py builds on this split)."""
    cb = ContinuousBatcher(engine, n_slots=2, params=_params(), max_frames=8)
    first = [cb.submit("hello world.") for _ in range(2)]
    queued = [cb.submit("hello world.") for _ in range(2)]
    results = cb.run_all()
    assert all(results[r].success for r in first + queued)
    for r in first:
        # admitted by the first step(); queue wait is submit->admission
        # host time only (no generation ran in between)
        assert results[r].t_queue_ms >= 0.0
    for r in queued:
        # had to wait for the first wave to finish at least one full
        # request (8 frames of generation + decode)
        assert results[r].t_queue_ms > results[first[0]].t_queue_ms
        assert results[r].t_queue_ms > 50.0
    # client-observed latency decomposes: both parts populated
    assert results[queued[0]].t_total_ms > 0.0
