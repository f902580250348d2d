"""Continuous-batching serving engine.

The reference's --serve loop handles one request at a time
(main.cpp:109-163). Here a fixed pool of B stream slots generates in
lock-step 40-frame chunks; finished slots are re-admitted with new
requests at chunk boundaries (admit latency <= one chunk) while the other
streams keep producing audio — the centerpiece capability of the TPU
rebuild (SURVEY.md §2 DP row: ">=16 realtime streams/chip").
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import talker, vocoder
from ..utils.trace import profile_trace
from .generate import (RING_PREFILL_SLOTS, admit_slots, ctx_bucket,
                       generate_chunk, init_state, make_consts, park_slot,
                       required_ctx_ring)
from .pipeline import (CHUNK_FRAMES, PCMRef, Qwen3TTS, TTSParams,
                       TTSResult)


@dataclass
class _Slot:
    busy: bool = False
    request_id: int = -1
    # preallocated [max_frames, n_codebooks] int32 frame buffer: appends
    # and chunk reads are O(1) slices (the previous per-wave
    # np.concatenate over a growing list was O(total_frames) per chunk —
    # quadratic host work over a request's life, felt at 48+ slots)
    buf: np.ndarray | None = None
    n_frames: int = 0      # frames generated into buf
    n_decoded: int = 0     # frames already sent to the vocoder
    audio: list = field(default_factory=list)
    max_frames: int = 0
    t_start: float = 0.0
    t_queue_ms: float = 0.0    # submit -> admission wall time
    on_audio: Callable[[np.ndarray, bool], None] | None = None
    final_sent: bool = False   # a final=True on_audio callback fired
    error: str = ""


class ContinuousBatcher:
    """Slot-based continuous batching over one jitted generation step.

    Usage:
        cb = ContinuousBatcher(engine, n_slots=16, params=TTSParams(...))
        rid = cb.submit("hello world.", embedding=None)
        while cb.pending():
            done = cb.step()          # one 40-frame chunk for all slots
            for rid, result in done.items(): ...
    """

    def __init__(self, engine: Qwen3TTS, n_slots: int = 16,
                 params: TTSParams | None = None,
                 max_frames: int = 1024, trailing_buf: int = 256):
        self.engine = engine
        self.params = params or TTSParams()
        self.n_slots = n_slots
        # the per-request token cap (params.max_audio_tokens, the
        # reference's --max-tokens) binds here too — previously only the
        # batcher-level max_frames did, so --serve --continuous silently
        # ignored --max-tokens
        self.max_frames = min(max_frames, self.params.max_audio_tokens)
        self.trailing_buf = trailing_buf
        cfg = engine.talker_cfg
        self.cfg = cfg
        self.slots = [_Slot() for _ in range(n_slots)]
        self._queue: list[tuple[int, str, np.ndarray | None,
                                Callable | None, float]] = []
        self._next_id = 0
        self._results: dict[int, TTSResult] = {}
        self._failed: dict[int, TTSResult] = {}
        self._retiring: list[_Slot] = []
        # retired slots whose audio readbacks are still in flight: their
        # results are emitted by a LATER step() once the transfers land,
        # so the dispatch loop never blocks on the device->host audio
        # link (measured 1.0-1.6 s per retire wave at 96 slots — the
        # single biggest serving-throughput cost, NOTES.md round 3)
        self._finalizing: list[_Slot] = []

        # ring-slot cache: prefill region + ring sized for max_frames.
        # QWEN3_TTS_RING=0 falls back to per-stream scatter writes.
        ring_env = os.environ.get("QWEN3_TTS_RING", "1")
        self.use_ring = ring_env != "0"
        if not self.use_ring:
            import sys
            print(
                "WARNING: QWEN3_TTS_RING=0 selects the per-stream-scatter "
                "KV write path, a debug/parity mode that is ~30x slower "
                "than the ring-slot cache on the kv-major layout "
                "(~340 ms/step at B=64 — likely sub-realtime). Use it "
                "only to cross-check ring-mode outputs.",
                file=sys.stderr, flush=True)
        self.ctx = required_ctx_ring(max_frames, CHUNK_FRAMES)
        # Memory-aware vocoder decode cap: past ~96 slots the talker KV
        # cache + an in-flight gen chunk leave no room for 48-wide
        # 76.8k-sample tail activations (measured OOM at B=224 with
        # 16-wide next to the pipelined gen chunk — bench.py VOC_SUB).
        # Batcher-local (passed per decode call): writing it onto the
        # shared engine leaked this batcher's cap into other users.
        self.voc_max_batch = (48 if n_slots <= 96 else
                              32 if n_slots <= 128 else
                              16 if n_slots <= 192 else 8)
        # AOT-cached executables for the serving-hot jitted calls
        # (generation buckets, admissions, park), keyed by every
        # shape-determining parameter. See Qwen3TTS.aot.
        self._execs: dict = {}
        self._reset_state()

    def _reset_state(self) -> None:
        """(Re)build the device state: dummy prefill, all slots parked.

        On a sharded engine (Qwen3TTS.shard(mesh)) the serving state is
        laid out over the mesh too: the slot batch splits across `dp`
        (each chip owns n_slots/dp streams' KV + per-slot state) and KV
        heads across `tp`. Every subsequent jitted step — admissions,
        ring-mode chunks, park — then runs SPMD; GSPMD turns the scalar
        ring-slot writes into per-shard updates with zero collectives on
        the dp axis."""
        cfg = self.cfg
        n_slots = self.n_slots
        dummy_tokens = jnp.zeros((n_slots, 16), jnp.int32)
        lens = jnp.full((n_slots,), 16, jnp.int32)
        spk = jnp.zeros((n_slots, cfg.hidden_size), jnp.float32)
        prefill = talker.build_prefill_inputs(
            self.engine.talker_w, cfg, dummy_tokens, lens, spk)
        prefill = prefill._replace(
            trailing_hidden=self._pad_trailing(prefill.trailing_hidden))
        self._steps_done = 0
        self._inflight = None  # (codes, valid, done) of the enqueued chunk
        seed = self.params.seed if self.params.seed is not None else 0
        # Ring-cache invariant at state creation, mirroring admit_slots:
        # a prefill longer than the reserved region would put write_slot
        # past RING_PREFILL_SLOTS, and the ring wrap would then clobber
        # still-valid prefill rows [RING_PREFILL_SLOTS, P).
        P = prefill.prefill_embd.shape[1]
        assert P <= RING_PREFILL_SLOTS, (
            f"prefill length {P} exceeds RING_PREFILL_SLOTS "
            f"{RING_PREFILL_SLOTS}; raise RING_PREFILL_SLOTS")
        from .generate import kv_layered_enabled, kv_quant_enabled
        self.state = init_state(self.engine.talker_w, cfg, prefill,
                                self.ctx, jax.random.PRNGKey(seed),
                                active=jnp.zeros((n_slots,), bool),
                                kv_quant=kv_quant_enabled(),
                                kv_layered=kv_layered_enabled())
        self.consts = make_consts(prefill, self.params.temperature,
                                  self.params.repetition_penalty)
        mesh = getattr(self.engine, "mesh", None)
        if mesh is not None and n_slots % mesh.shape.get("dp", 1) == 0:
            from ..parallel.mesh import shard_consts, shard_gen_state
            self.state = shard_gen_state(self.state, mesh)
            self.consts = shard_consts(self.consts, mesh)

    def warmup(self, token_buckets: tuple[int, ...] = (16,)) -> None:
        """Precompile every executable the serving loop can hit, so no
        request pays a compile stall: the generation chunk at each
        read-ctx bucket, slot admission at each of `token_buckets`
        (text-token counts round up to 16-multiples; warm the buckets
        your texts actually hit — an unwarmed bucket costs one 30-90 s
        tunnel compile mid-serve the first time, AOT-cached afterwards),
        and the vocoder at each decode bucket. The TPU analogue of the
        reference's warmup_cublas + prebuilt engines
        (trt_code_predictor.cpp:272-292). With AOT artifacts on disk the
        whole warmup is deserialization: measured 14.9 s vs 545 s cold
        at 96 slots (NOTES.md round 3)."""
        t0 = time.monotonic()
        # admission path (batched, fixed K=n_slots shape)
        K = self.n_slots
        for tb in token_buckets:
            tb = max(-(-tb // 16) * 16, 16)
            tok = jnp.zeros((K, tb), jnp.int32)
            tlen = jnp.full((K,), tb, jnp.int32)
            spk1 = jnp.zeros((K, self.cfg.hidden_size), jnp.float32)
            pf = talker.build_prefill_inputs(self.engine.talker_w,
                                             self.cfg, tok, tlen, spk1)
            self._ensure_trailing_capacity(pf.trailing_hidden.shape[1])
            pf = pf._replace(trailing_hidden=self._pad_trailing(
                pf.trailing_hidden))
            slots0 = jnp.zeros((K,), jnp.int32)
            self.state, self.consts = self._admit_fn(slots0, pf)(
                self.engine.talker_w, self.state, self.consts, slots0, pf)
        self.state = self._park_fn()(self.state, jnp.int32(0))

        # generation at every read-ctx bucket coverage can reach
        buckets: list[int] = []
        steps = 0
        while True:
            covered = RING_PREFILL_SLOTS + steps + CHUNK_FRAMES
            rc = ctx_bucket(min(covered, self.ctx), 0, self.ctx)
            if not buckets or rc != buckets[-1]:
                buckets.append(rc)
            if rc >= self.ctx:
                break
            steps += CHUNK_FRAMES
        for rc in buckets:
            self.state, _, _ = self._gen_fn(rc)(
                self.engine.talker_w, self.state, self.consts)

        # vocoder at every decode-batch bucket
        if self.engine.voc_w is not None:
            n_cb = self.cfg.n_codebooks
            sizes = sorted({self.engine.voc_bucket(n, self.n_slots)
                            for n in range(1, self.n_slots + 1)})
            for nb in sizes:
                # pcm16=True is what _decode_slots calls — it is a
                # DIFFERENT jitted graph (int16 conversion fused in);
                # warming the f32 variant here used to leave a 30-70 s
                # tunnel compile stall on the first decode of every
                # bucket during live serving
                self.engine._decode_chunk_batch(
                    np.zeros((nb, CHUNK_FRAMES, n_cb), np.int32),
                    pcm16=True, max_batch=self.voc_max_batch)

        # warm chunks advanced the ring; restore a pristine state
        self._reset_state()
        import sys
        print(f"  Serving warmup: {len(buckets)} gen bucket(s) + "
              f"vocoder buckets compiled in {time.monotonic()-t0:.1f} s",
              file=sys.stderr, flush=True)

    # -- AOT-cached executables ----------------------------------------
    def _key_base(self) -> str:
        from ..models import talker
        from ..models.code_predictor import _resolve_impl as cp_impl
        from .generate import kv_layered_enabled, kv_quant_enabled
        mesh = getattr(self.engine, "mesh", None)
        mtag = (f"-m{mesh.shape.get('dp', 1)}x{mesh.shape.get('tp', 1)}"
                if mesh is not None else "")
        # impl switches are trace-time state baked into the executable;
        # key them so a cached artifact can never carry a different
        # talker/codepred kernel than the current env selects
        itag = f"-tk{talker._resolve_impl()}-cp{cp_impl()}"
        return (f"{self.engine.model_tag()}-b{self.n_slots}-c{self.ctx}"
                f"-q{int(kv_quant_enabled())}"
                f"-l{int(kv_layered_enabled())}{mtag}{itag}")

    def _gen_fn(self, read_ctx: int):
        """Compiled generation-chunk executable for one read-ctx bucket.
        Dynamic args: (talker_w, state, consts); state is donated."""
        mkey = ("gen", read_ctx, self.trailing_buf)
        fn = self._execs.get(mkey)
        if fn is None:
            greedy = self.params.temperature <= 0.0
            top_p = float(getattr(self.params, "top_p", 1.0))
            name = (f"gen-{self._key_base()}-rc{read_ctx}"
                    f"-k{self.params.top_k}-g{int(greedy)}"
                    f"-r{int(self.use_ring)}-t{self.trailing_buf}"
                    + (f"-p{top_p}" if top_p < 1.0 else ""))
            fn = self.engine.aot.get_or_compile(
                name, generate_chunk, self.engine.talker_w, self.cfg,
                self.state, self.consts, self.params.top_k, CHUNK_FRAMES,
                greedy=greedy, read_ctx=read_ctx, ring=self.use_ring,
                top_p=top_p)
            self._execs[mkey] = fn
        return fn

    def _admit_fn(self, slots_arr, prefill):
        """Compiled admit_slots executable for this token-bucket shape.
        Dynamic args: (talker_w, state, consts, slots, prefill); state
        and consts are donated."""
        t_max = prefill.prefill_embd.shape[1]
        mkey = ("admit", t_max, self.trailing_buf)
        fn = self._execs.get(mkey)
        if fn is None:
            name = (f"admit-{self._key_base()}-p{t_max}"
                    f"-t{self.trailing_buf}")
            fn = self.engine.aot.get_or_compile(
                name, admit_slots, self.engine.talker_w, self.cfg,
                self.state, self.consts, slots_arr, prefill)
            self._execs[mkey] = fn
        return fn

    def _park_fn(self):
        mkey = ("park",)
        fn = self._execs.get(mkey)
        if fn is None:
            fn = self.engine.aot.get_or_compile(
                f"park-{self._key_base()}", park_slot, self.state,
                jnp.int32(0))
            self._execs[mkey] = fn
        return fn

    # ------------------------------------------------------------------
    def _ensure_trailing_capacity(self, n_rows: int) -> None:
        """Grow the shared trailing-text buffer to a power-of-two bucket
        covering n_rows (one generate_chunk/admit_slot recompile per new
        bucket), so long texts are never silently truncated — the
        reference's trailing schedule is arbitrary-length
        (tts_transformer.cpp:1214-1228).

        Rows past max_frames are never read (the frame cap retires the
        stream first), so capacity is capped there."""
        n_rows = min(n_rows, self.max_frames)
        if n_rows <= self.trailing_buf:
            return
        new = self.trailing_buf
        while new < n_rows:
            new *= 2
        grow = new - self.trailing_buf
        self.trailing_buf = new
        self.consts = self.consts._replace(
            trailing_hidden=jnp.pad(self.consts.trailing_hidden,
                                    ((0, 0), (0, grow), (0, 0))))

    def _pad_trailing(self, trailing: jax.Array) -> jax.Array:
        t = trailing.shape[1]
        if t < self.trailing_buf:
            return jnp.pad(trailing,
                           ((0, 0), (0, self.trailing_buf - t), (0, 0)))
        if t > self.trailing_buf:
            # only rows the frame cap makes unreachable may be dropped
            assert self.trailing_buf >= self.max_frames, (
                f"trailing schedule ({t} rows) exceeds the buffer "
                f"({self.trailing_buf}) below max_frames "
                f"({self.max_frames}) — _ensure_trailing_capacity bug")
        return trailing[:, :self.trailing_buf]

    def submit(self, text: str, embedding: np.ndarray | None = None,
               on_audio: Callable[[np.ndarray, bool], None] | None = None,
               ) -> int:
        """Queue a request; returns a request id. on_audio(samples, final)
        fires per decoded chunk.

        Submission only enqueues: every device interaction (admission,
        generation, decode) happens inside step(), whose failure isolation
        fails in-flight requests rather than the process — a queued
        request can never corrupt live streams from the submit path."""
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, text, embedding, on_audio,
                            time.monotonic()))
        return rid

    def pending(self) -> bool:
        return (bool(self._queue) or any(s.busy for s in self.slots)
                or bool(self._finalizing))

    def _admit_pending(self) -> None:
        """Admit every queued request that has a free slot, in ONE
        batched admit_slots call (K padded to n_slots by repeating the
        last real admission — each jitted dispatch costs a host round
        trip, so per-request admissions serialized full turnovers).
        Token arrays pad to 16-token buckets: one compile per bucket."""
        cfg = self.cfg
        free = [i for i, s in enumerate(self.slots) if not s.busy]
        take = min(len(free), len(self._queue))
        if take == 0:
            return
        batch = []
        token_lists = []
        hidden = self.cfg.hidden_size
        while len(batch) < take and self._queue:
            item = self._queue.pop(0)
            try:  # poisoned text/embedding fails ITS request only
                toks = self.engine.tokenizer.encode_for_tts(item[1])
                if item[2] is not None:
                    emb = np.asarray(item[2], np.float32).reshape(-1)
                    if emb.shape != (hidden,):
                        raise ValueError(
                            f"speaker embedding shape {emb.shape} != "
                            f"({hidden},)")
                    item = (item[0], item[1], emb, item[3], item[4])
                token_lists.append(toks)
                batch.append(item)
            except Exception as e:
                self._failed[item[0]] = self._error_result(
                    f"bad request: {type(e).__name__}: {e}")
        take = len(batch)
        if take == 0:
            return
        slot_ids = free[:take]

        K = self.n_slots
        t_max = max(len(t) for t in token_lists)
        t_max = max(-(-t_max // 16) * 16, 16)
        tokens = np.zeros((K, t_max), np.int32)
        lens = np.zeros((K,), np.int32)
        spk = np.zeros((K, cfg.hidden_size), np.float32)
        slots_arr = np.zeros((K,), np.int32)
        for j in range(K):
            src = min(j, take - 1)       # pad rows duplicate the last one
            toks = token_lists[src]
            tokens[j, :len(toks)] = toks
            lens[j] = len(toks)
            emb = batch[src][2]
            if emb is not None:
                spk[j] = np.asarray(emb, np.float32)
            slots_arr[j] = slot_ids[src]

        prefill = talker.build_prefill_inputs(
            self.engine.talker_w, cfg, jnp.asarray(tokens),
            jnp.asarray(lens), jnp.asarray(spk),
            language_id=jnp.full((K,), self.params.language_id, jnp.int32))
        self._ensure_trailing_capacity(prefill.trailing_hidden.shape[1])
        prefill = prefill._replace(
            trailing_hidden=self._pad_trailing(prefill.trailing_hidden))
        slots_j = jnp.asarray(slots_arr)
        self.state, self.consts = self._admit_fn(slots_j, prefill)(
            self.engine.talker_w, self.state, self.consts, slots_j,
            prefill)
        t_admit = time.monotonic()
        for j in range(take):
            rid, _, _, on_audio, t_submit = batch[j]
            self.slots[slot_ids[j]] = _Slot(
                busy=True, request_id=rid, max_frames=self.max_frames,
                buf=np.empty((self.max_frames, cfg.n_codebooks), np.int32),
                t_start=t_admit, on_audio=on_audio,
                t_queue_ms=(t_admit - t_submit) * 1e3)

    # ------------------------------------------------------------------
    def _dispatch_chunk(self) -> None:
        """Enqueue one 40-frame generation chunk on the device."""
        # attention read window: prefill region + every ring slot written
        # so far (bucketed; full ctx once the ring has wrapped)
        if self.use_ring:
            covered = RING_PREFILL_SLOTS + self._steps_done + CHUNK_FRAMES
            read_ctx = ctx_bucket(min(covered, self.ctx), 0, self.ctx)
        else:
            read_ctx = ctx_bucket(int(np.asarray(self.state.n_past).max()),
                                  CHUNK_FRAMES, self.ctx)
        self.state, codes, valid = self._gen_fn(read_ctx)(
            self.engine.talker_w, self.state, self.consts)
        self._steps_done += CHUNK_FRAMES
        # snapshot done at dispatch (the live self.state may advance past
        # this chunk before the host reads it) and start the host copies
        # NOW: the transfers stream as soon as the chunk computes, so the
        # blocking np.asarray at the top of the next step() finds the
        # data already local instead of paying a ~30 ms tunnel round trip
        # per array (NOTES.md round 3).
        done = self.state.done
        for a in (codes, valid, done):
            try:
                a.copy_to_host_async()
            except Exception:
                pass  # platform without async host copies
        self._inflight = (codes, valid, done)

    def step(self) -> dict[int, TTSResult]:
        """Process one 40-frame chunk across all slots; admit queued
        requests into freed slots; return results for finished requests.

        Pipelined dispatch: the next chunk's generation is enqueued before
        this chunk's vocoder decode runs, so the device queue stays full
        (gen k+1 | voc k back-to-back, no host-turnaround bubble).
        Requests admitted into slots freed THIS step still join chunk k+1
        (admit ops chain onto the in-flight state).

        Failure isolation (the reference's graceful-degradation policy,
        SURVEY.md §5, extended to multi-stream): per-request failures
        (poisoned text, a raising on_audio callback) fail that request
        only; an unexpected failure in the shared device step fails the
        in-flight requests with error results, rebuilds the device state,
        and keeps serving — still-queued requests admit on the next step.

        QWEN3_TTS_PROFILE=<dir> captures a jax.profiler trace per step."""
        with profile_trace("serve.step"):
            try:
                out = self._step_impl()
            except Exception as e:
                out = self._fail_inflight(e)
        if self._failed:
            out = {**self._failed, **out}
            self._failed = {}
        return out

    def _error_result(self, msg: str, t_start: float | None = None
                      ) -> TTSResult:
        r = TTSResult()
        r.success = False
        r.error_msg = msg
        if t_start:
            r.t_total_ms = (time.monotonic() - t_start) * 1e3
        return r

    def _fail_inflight(self, exc: Exception) -> dict[int, TTSResult]:
        """Fail every in-flight request and rebuild the device state (it
        cannot be trusted after an arbitrary failure mid-step). The batch
        survives: queued requests stay queued and admit on the next
        step."""
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        msg = f"serving step failed: {type(exc).__name__}: {exc}"
        out: dict[int, TTSResult] = {}
        for slot in self._retiring:  # freed mid-step, not yet finalized
            out[slot.request_id] = self._error_result(msg, slot.t_start)
        self._retiring = []
        for b, slot in enumerate(self.slots):
            if slot.busy:
                out[slot.request_id] = self._error_result(msg, slot.t_start)
                self.slots[b] = _Slot()
        try:
            self._reset_state()
        except Exception:
            traceback.print_exc(file=sys.stderr)
        return out

    def _step_impl(self) -> dict[int, TTSResult]:
        timing = os.environ.get("QWEN3_TTS_SERVE_TIMING") == "1"
        t = time.monotonic
        t0 = t()
        if self._inflight is None:
            self._admit_pending()
            if not any(s.busy for s in self.slots):
                # nothing generating: only in-flight readbacks remain
                return self._drain_finalizing(block=True)
            self._dispatch_chunk()
        codes_d, valid_d, done_d = self._inflight
        self._inflight = None
        codes_h = np.asarray(codes_d)    # [chunk, B, 16]
        valid_h = np.asarray(valid_d)    # [chunk, B]
        done_h = np.asarray(done_d)
        t_read = t()

        live: list[_Slot] = []
        retired: list[_Slot] = []
        self._retiring = retired  # visible to _fail_inflight: slots freed
        #                           below must still fail loudly, not
        #                           vanish, if decode/finalize raises
        for b, slot in enumerate(self.slots):
            if not slot.busy:
                continue
            got = codes_h[valid_h[:, b], b]
            room = slot.max_frames - slot.n_frames
            if len(got) > room:
                got = got[:room]
            if len(got):
                slot.buf[slot.n_frames:slot.n_frames + len(got)] = got
                slot.n_frames += len(got)
            is_done = bool(done_h[b]) or slot.n_frames >= slot.max_frames
            if is_done:
                if not bool(done_h[b]):
                    # retired by the frame cap, not EOS: stop the device
                    # stream so its cache position freezes
                    self.state = self._park_fn()(self.state, jnp.int32(b))
                retired.append(slot)
                self.slots[b] = _Slot()  # free before admissions
            else:
                live.append(slot)

        t_slots = t()
        # admissions first so freed slots join the very next chunk, then
        # enqueue that chunk BEFORE the vocoder decode of this one
        self._admit_pending()
        t_admit = t()
        if any(s.busy for s in self.slots):
            self._dispatch_chunk()
        t_gen = t()
        self._decode_slots(live, retired)
        t_dec = t()
        # retired slots join the deferred-finalize queue; emit whichever
        # (earlier or current) retirees' transfers have landed. Block
        # only when there is no device work left to overlap with.
        self._finalizing.extend(retired)
        self._retiring = []
        out = self._drain_finalizing(
            block=not (any(s.busy for s in self.slots) or self._queue))
        if timing:
            import sys
            print(f"[serve.step] read {1e3*(t_read-t0):.0f} slots "
                  f"{1e3*(t_slots-t_read):.0f} admit "
                  f"{1e3*(t_admit-t_slots):.0f} gen-dispatch "
                  f"{1e3*(t_gen-t_admit):.0f} decode "
                  f"{1e3*(t_dec-t_gen):.0f} finalize "
                  f"{1e3*(t()-t_dec):.0f} ms "
                  f"(live {len(live)} retired {len(retired)} "
                  f"deferred {len(self._finalizing)})",
                  file=sys.stderr, flush=True)
        return out

    def _drain_finalizing(self, block: bool) -> dict[int, TTSResult]:
        """Finalize retired slots whose audio transfers have completed
        (checked via Future.done() — never blocks); with block=True,
        finalize everything (end-of-stream drain)."""
        if not self._finalizing:
            return {}
        out: dict[int, TTSResult] = {}
        still: list[_Slot] = []
        for slot in self._finalizing:
            ready = all(p.fut.done() for p in slot.audio
                        if isinstance(p, PCMRef))
            if block or ready:
                out[slot.request_id] = self._finalize(slot)
            else:
                still.append(slot)
        self._finalizing = still
        return out

    def _decode_slots(self, live: list[_Slot], retired: list[_Slot]) -> None:
        """Vocoder-decode every slot's ready 40-frame chunks, batched
        across slots (one [n, 40] call per wave instead of n B=1 calls),
        plus the ragged final tail of retired slots."""
        if self.engine.voc_w is None:
            return
        n_cb = self.cfg.n_codebooks
        targets = [(s, False) for s in live] + [(s, True) for s in retired]
        while True:
            work: list[tuple[_Slot, np.ndarray, int, bool]] = []
            for slot, is_retired in targets:
                remaining = slot.n_frames - slot.n_decoded
                if remaining >= CHUNK_FRAMES:
                    # a retired stream's last FULL chunk is its final
                    # audio too (frame count an exact CHUNK multiple) —
                    # streaming consumers key teardown on final=True
                    work.append((slot,
                                 slot.buf[slot.n_decoded:
                                          slot.n_decoded + CHUNK_FRAMES],
                                 CHUNK_FRAMES,
                                 is_retired and remaining == CHUNK_FRAMES))
                elif remaining > 0 and is_retired:
                    part = np.zeros((CHUNK_FRAMES, n_cb), np.int32)
                    part[:remaining] = slot.buf[slot.n_decoded:slot.n_frames]
                    work.append((slot, part, remaining, True))
            if not work:
                return
            nb = self.engine.voc_bucket(len(work), len(self.slots))
            batch = np.zeros((nb, CHUNK_FRAMES, n_cb), np.int32)
            for i, (_, chunk, _, _) in enumerate(work):
                batch[i] = chunk
            # int16 PCM on device; ONE whole-batch transfer per decode,
            # run on the readback thread so it overlaps device compute
            audio = self.engine._decode_chunk_batch(
                batch, pcm16=True, max_batch=self.voc_max_batch)
            fut = self.engine.readback_submit(audio)
            for i, (slot, _, k, is_tail) in enumerate(work):
                slot.n_decoded += k
                valid = None
                if k < CHUNK_FRAMES:
                    valid = vocoder.vocoder_output_length(
                        self.engine.voc_w, self.engine.voc_cfg, k,
                        trim="causal")
                ref = PCMRef(fut, i, valid)
                slot.audio.append(ref)
                if slot.on_audio:
                    try:
                        slot.on_audio(Qwen3TTS._pcm_to_f32(ref), is_tail)
                        slot.final_sent = slot.final_sent or is_tail
                    except Exception as e:
                        # a raising sink fails ITS request, not the batch
                        slot.error = (f"on_audio callback failed: "
                                      f"{type(e).__name__}: {e}")
                        slot.on_audio = None

    def _finalize(self, slot: _Slot) -> TTSResult:
        if slot.on_audio and not slot.final_sent and not slot.error:
            # the stream's audio all went out while it was still live
            # (e.g. it retired exactly at a decoded chunk boundary):
            # close the stream with an empty final chunk
            try:
                slot.on_audio(np.zeros(0, np.float32), True)
            except Exception as e:
                slot.error = (f"on_audio callback failed: "
                              f"{type(e).__name__}: {e}")
            slot.final_sent = True
        r = TTSResult()
        r.n_frames = slot.n_frames
        try:
            r.audio = Qwen3TTS._pcm_parts_to_f32(slot.audio)
        except Exception as e:  # readback failure is per-request too
            slot.error = slot.error or (f"audio readback failed: "
                                        f"{type(e).__name__}: {e}")
        r.sample_rate = (self.engine.voc_cfg.sample_rate
                         if self.engine.voc_cfg else 24000)
        r.success = r.n_frames > 0 and not slot.error
        if slot.error:
            r.error_msg = slot.error
        elif not r.success:
            r.error_msg = "No speech codes generated"
        r.t_total_ms = (time.monotonic() - slot.t_start) * 1e3
        r.t_queue_ms = slot.t_queue_ms
        return r

    def run_all(self) -> dict[int, TTSResult]:
        """Drive step() until every queued/running request completes."""
        out: dict[int, TTSResult] = {}
        while self.pending():
            out.update(self.step())
        return out
