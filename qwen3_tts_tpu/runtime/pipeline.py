"""Pipeline orchestrator: load models, synthesize, voice cloning.

TPU-native rebuild of class Qwen3TTS (qwen3_tts.{h,cpp}): same model-dir
layout (qwen3-tts-0.6b-f16.gguf + qwen3-tts-tokenizer-f16.gguf,
qwen3_tts.cpp:117-118), same lazy speaker-encoder loading (:281-297), same
timing/memory surface (tts_result, qwen3_tts.h:46-75) — but batched: one
engine serves many concurrent streams per chip, with the 40-frame
streaming vocoder decode mirroring the TRT callback path
(qwen3_tts.cpp:437-453).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeakerEncoderConfig, TalkerConfig, VocoderConfig
from ..io.gguf import GGUFReader
from ..models import speaker_encoder as spk
from ..models import talker, vocoder, weights as W
from ..tokenizer import TextTokenizer
from ..utils.trace import StageTimer, memory_snapshot, profile_trace
from . import audio_io
from .generate import (ctx_bucket, generate_chunk, init_state, make_consts,
                       required_ctx)

CHUNK_FRAMES = 40  # streaming vocoder interval (qwen3_tts.cpp:463)


class PCMRef:
    """A row of a batch audio readback that is still in flight: holds the
    Future of the WHOLE [nb, T] int16 host array plus this stream's row
    and valid-sample count. One transfer serves every stream in the
    batch; consumers resolve lazily."""

    __slots__ = ("fut", "row", "valid")

    def __init__(self, fut, row: int, valid: int | None = None):
        self.fut = fut
        self.row = row
        self.valid = valid

    def resolve(self) -> np.ndarray:
        arr = self.fut.result()[self.row]
        return arr[:self.valid] if self.valid is not None else arr


@dataclass
class TTSParams:
    """Generation parameters (tts_params, qwen3_tts.h:18-43)."""
    max_audio_tokens: int = 4096
    temperature: float = 0.9
    top_p: float = 1.0          # nucleus filter; 1.0 = off. The reference
                                # ACCEPTS --top-p but never applies it
                                # (qwen3_tts.h:26 vs tts_transformer.cpp:
                                # 2447-2495); here it works when set.
    top_k: int = 50
    repetition_penalty: float = 1.05
    language_id: int = 2050     # English (qwen3_tts.cpp:461)
    seed: int | None = None
    print_progress: bool = False
    print_timing: bool = True
    streaming_vocoder: bool = True   # 40-frame chunked decode (TRT-path behavior)


@dataclass
class TTSResult:
    """Synthesis result (tts_result, qwen3_tts.h:46-75)."""
    audio: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    sample_rate: int = 24000
    success: bool = False
    error_msg: str = ""
    n_frames: int = 0
    t_tokenize_ms: float = 0.0
    t_encode_ms: float = 0.0
    t_generate_ms: float = 0.0
    t_decode_ms: float = 0.0
    t_total_ms: float = 0.0
    # serving only (ContinuousBatcher): wall time the request sat queued
    # before a slot admitted it. t_total_ms counts from ADMISSION, so
    # client-observed latency is t_queue_ms + t_total_ms.
    t_queue_ms: float = 0.0
    mem_rss_peak_bytes: int = 0
    device_mem_bytes: int = 0


def _now_ms() -> float:
    return time.monotonic() * 1e3


def _log(msg: str) -> None:
    import sys
    print(msg, file=sys.stderr, flush=True)


class Qwen3TTS:
    """End-to-end TTS engine: text -> 24 kHz waveform, with voice cloning."""

    def __init__(self) -> None:
        self.tokenizer: TextTokenizer | None = None
        self.talker_cfg: TalkerConfig | None = None
        self.talker_w: dict[str, Any] | None = None
        self.voc_cfg: VocoderConfig | None = None
        self.voc_w: dict[str, Any] | None = None
        self.spk_cfg: SpeakerEncoderConfig | None = None
        self.spk_w: dict[str, Any] | None = None
        self._tts_model_path: str | None = None
        self.error_msg = ""
        self.low_mem = False
        self.mesh = None

    # -- loading ------------------------------------------------------------
    def load_models(self, model_dir: str) -> bool:
        """Load tokenizer + talker eagerly, vocoder eagerly, speaker encoder
        lazily (load_models, qwen3_tts.cpp:107-230).

        QWEN3_TTS_LOW_MEM=1 keeps vocoder weights in host memory and stages
        them to the device per decode — the TPU analogue of the reference's
        low-memory component unloading (qwen3_tts.cpp:125-128, :486-527).
        """
        t0 = _now_ms()
        low_mem = os.environ.get("QWEN3_TTS_LOW_MEM", "")
        self.low_mem = bool(low_mem) and low_mem != "0"
        if self.low_mem:
            _log("  Low-memory mode enabled (host-resident vocoder weights)")
        tts_path = os.path.join(model_dir, "qwen3-tts-0.6b-f16.gguf")
        tok_path = os.path.join(model_dir, "qwen3-tts-tokenizer-f16.gguf")
        self._tts_model_path = tts_path
        try:
            with GGUFReader(tts_path) as r:
                t1 = _now_ms()
                self.tokenizer = TextTokenizer.from_gguf(r)
                _log(f"  Text tokenizer loaded: vocab_size="
                     f"{len(self.tokenizer.id_to_token)} ({_now_ms()-t1:.0f} ms)")
                t1 = _now_ms()
                self.talker_cfg = TalkerConfig.from_gguf(r)
                self.talker_w = W.load_talker_weights(r, self.talker_cfg)
                _log(f"  Talker loaded: hidden_size={self.talker_cfg.hidden_size}"
                     f", n_layers={self.talker_cfg.n_layers}"
                     f" ({_now_ms()-t1:.0f} ms)")
            _log("  Speaker encoder: deferred (lazy load)")
            t1 = _now_ms()
            with GGUFReader(tok_path) as r:
                self.voc_cfg = VocoderConfig.from_gguf(r)
                self.voc_w = vocoder.load_vocoder_weights(r, self.voc_cfg)
            if jax.default_backend() == "tpu":
                # bf16 vocoder fast path (reference runs its TRT vocoder
                # in FP16 — README.md:61-66)
                self.voc_w = vocoder.cast_weights(self.voc_w)
            if self.low_mem:
                self.voc_w = jax.tree.map(np.asarray, self.voc_w)
            _log(f"  Vocoder loaded: sample_rate={self.voc_cfg.sample_rate}"
                 f", n_codebooks={self.voc_cfg.n_codebooks}"
                 f" ({_now_ms()-t1:.0f} ms)")
        except (OSError, ValueError, KeyError) as e:
            self.error_msg = f"Failed to load models: {e}"
            return False
        _log(f"All models loaded in {_now_ms()-t0:.0f} ms")
        return True

    @classmethod
    def from_components(cls, tokenizer, talker_cfg, talker_w,
                        voc_cfg, voc_w, spk_cfg=None, spk_w=None) -> "Qwen3TTS":
        """Assemble an engine from in-memory components (tests/benches)."""
        self = cls()
        self.tokenizer = tokenizer
        self.talker_cfg = talker_cfg
        self.talker_w = talker_w
        self.voc_cfg = voc_cfg
        self.voc_w = voc_w
        self.spk_cfg = spk_cfg
        self.spk_w = spk_w
        return self

    def shard(self, mesh) -> "Qwen3TTS":
        """Shard talker weights over a jax.sharding Mesh (dp x tp).

        After this, every jitted generation function runs SPMD over the
        mesh — the batch of streams splits across `dp`, and (optionally)
        the talker's row-parallel matmuls across `tp`, with XLA GSPMD
        inserting the ICI collectives. The reference has no multi-device
        story at all (SURVEY.md §2 parallelism table)."""
        from ..parallel.mesh import shard_talker_weights
        self.talker_w = shard_talker_weights(self.talker_w, mesh,
                                             self.talker_cfg)
        self.mesh = mesh
        return self

    def _ensure_speaker_encoder(self) -> bool:
        if self.spk_w is not None:
            return True
        if not self._tts_model_path:
            self.error_msg = "speaker encoder unavailable (no model path)"
            return False
        try:
            with GGUFReader(self._tts_model_path) as r:
                self.spk_cfg = SpeakerEncoderConfig.from_gguf(r)
                self.spk_w = spk.load_speaker_encoder_weights(r, self.spk_cfg)
            return True
        except (OSError, ValueError, KeyError) as e:
            self.error_msg = f"Failed to load speaker encoder: {e}"
            return False

    # -- speaker encoding ----------------------------------------------------
    def encode_speaker(self, reference_audio: str) -> np.ndarray | None:
        """Reference WAV -> 1024-d voice embedding
        (encode_speaker, qwen3_tts.cpp:315-350)."""
        if not self._ensure_speaker_encoder():
            return None
        try:
            samples, sr = audio_io.load_wav(reference_audio)
        except (OSError, ValueError) as e:
            self.error_msg = f"Failed to load reference audio: {e}"
            return None
        return self.encode_speaker_samples(samples, sr)

    def encode_speaker_samples(self, samples: np.ndarray,
                               sample_rate: int) -> np.ndarray | None:
        if not self._ensure_speaker_encoder():
            return None
        cfg = self.spk_cfg
        if sample_rate != cfg.sample_rate:
            samples = audio_io.resample_linear(samples, sample_rate,
                                               cfg.sample_rate)
        mel = spk.mel_spectrogram(np.asarray(samples, np.float32), cfg)
        t = mel.shape[0]
        t_bucket = spk.bucket_frames(t)
        mel_pad = np.zeros((1, t_bucket, cfg.n_mels), np.float32)
        mel_pad[0, :t] = mel
        emb = spk.encode(self.spk_w, cfg, jnp.asarray(mel_pad),
                         jnp.array([t], jnp.int32))
        return np.asarray(emb[0])

    def encode_speaker_batch(self, clips: list[np.ndarray],
                             sample_rate: int) -> np.ndarray | None:
        """Bulk voice enrollment: N clips -> [N, 1024] embeddings in ONE
        device dispatch (mel + ECAPA both on-device, jitted per
        sample-length bucket). The single-clip path (encode_speaker_samples)
        keeps the host-side numpy mel; this one uses
        spk.mel_spectrogram_batch — same numerics (tests assert parity).
        """
        if not self._ensure_speaker_encoder():
            return None
        if not clips:
            return np.zeros((0, self.spk_cfg.embedding_dim), np.float32)
        cfg = self.spk_cfg
        res = [audio_io.resample_linear(np.asarray(c, np.float32),
                                        sample_rate, cfg.sample_rate)
               if sample_rate != cfg.sample_rate else
               np.asarray(c, np.float32) for c in clips]
        n = np.array([len(c) for c in res], np.int32)
        if (n <= 0).any():
            self.error_msg = "empty reference clip in batch"
            return None
        bucket = spk.bucket_samples(int(n.max()), cfg)
        batch = np.zeros((len(res), bucket), np.float32)
        for i, c in enumerate(res):
            batch[i, :len(c)] = c
        mel, n_frames = spk.mel_spectrogram_batch(
            jnp.asarray(batch), jnp.asarray(n), cfg)
        emb = spk.encode(self.spk_w, cfg, mel, n_frames)
        return np.asarray(emb)

    # -- synthesis -----------------------------------------------------------
    def synthesize(self, text: str, params: TTSParams | None = None) -> TTSResult:
        """Default voice = zero speaker embedding (qwen3_tts.cpp:241-245)."""
        return self.synthesize_batch([text], None, params)[0]

    def synthesize_with_embedding(self, text: str, embedding: np.ndarray,
                                  params: TTSParams | None = None) -> TTSResult:
        return self.synthesize_batch([text], [embedding], params)[0]

    def synthesize_with_voice(self, text: str, reference_audio: str,
                              params: TTSParams | None = None) -> TTSResult:
        t0 = _now_ms()
        emb = self.encode_speaker(reference_audio)
        if emb is None:
            r = TTSResult()
            r.error_msg = self.error_msg
            return r
        res = self.synthesize_batch([text], [emb], params)[0]
        res.t_encode_ms = _now_ms() - t0 - res.t_total_ms
        return res

    def synthesize_batch(self, texts: Sequence[str],
                         embeddings: Sequence[np.ndarray] | None = None,
                         params: TTSParams | None = None,
                         on_chunk: Callable[[int, np.ndarray], None] | None = None,
                         ) -> list[TTSResult]:
        """Synthesize a batch of independent streams in lock-step.

        This is the capability the reference lacks entirely (its server
        loop is serial, main.cpp:109-163): all streams share each jitted
        frame step's MXU work.
        on_chunk(stream_idx, samples) fires per 40-frame chunk when
        streaming decode is enabled.

        Set QWEN3_TTS_PROFILE=<dir> to capture a jax.profiler device trace
        of the whole call (utils/trace.py).
        """
        with profile_trace("synthesize_batch"):
            return self._synthesize_batch_impl(texts, embeddings, params,
                                               on_chunk)

    def _synthesize_batch_impl(self, texts, embeddings=None, params=None,
                               on_chunk=None) -> list[TTSResult]:
        p = params or TTSParams()
        results = [TTSResult() for _ in texts]
        if self.talker_w is None or self.tokenizer is None:
            for r in results:
                r.error_msg = "Models not loaded"
            return results
        cfg = self.talker_cfg
        t_total0 = _now_ms()
        timer = StageTimer()

        # 1. tokenize (qwen3_tts.cpp:396)
        with timer.stage("Tokenization"):
            token_lists = [self.tokenizer.encode_for_tts(t) for t in texts]
        t_tok = timer.stages["Tokenization"]
        bad = set()
        for i, (r, toks) in enumerate(zip(results, token_lists)):
            if len(toks) < 4:
                # generate() requires >= 4 tokens (tts_transformer.cpp:2360)
                r.error_msg = "Need at least 4 text tokens for generation"
                bad.add(i)
        if len(bad) == len(texts):
            return results
        B = len(texts)
        t_max = max(len(t) for t in token_lists)
        t_max = max(-(-t_max // 16) * 16, 16)
        tokens = np.zeros((B, t_max), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, toks in enumerate(token_lists):
            tokens[i, :len(toks)] = toks
            lens[i] = len(toks)

        if p.print_progress:
            for toks in token_lists:
                head = " ".join(str(t) for t in toks[:10])
                more = "..." if len(toks) > 10 else ""
                _log(f"Text tokenized: {len(toks)} tokens\n"
                     f"  Tokens: {head} {more}")

        if embeddings is None:
            spk_emb = np.zeros((B, cfg.hidden_size), np.float32)
        else:
            spk_emb = np.stack([np.asarray(e, np.float32)
                                for e in embeddings])

        # 2. prefill + chunked generation
        t0 = _now_ms()
        prefill = talker.build_prefill_inputs(
            self.talker_w, cfg, jnp.asarray(tokens), jnp.asarray(lens),
            jnp.asarray(spk_emb),
            language_id=jnp.full((B,), p.language_id, jnp.int32))
        max_ctx = required_ctx(prefill.prefill_embd.shape[1],
                               p.max_audio_tokens, CHUNK_FRAMES)
        seed = p.seed if p.seed is not None else np.random.randint(0, 2**31)
        from .generate import kv_layered_enabled, kv_quant_enabled
        state = init_state(self.talker_w, cfg, prefill, max_ctx,
                           jax.random.PRNGKey(seed),
                           kv_quant=kv_quant_enabled(),
                           kv_layered=kv_layered_enabled())
        if self.mesh is not None:
            dp = self.mesh.shape.get("dp", 1)
            if B % dp == 0:
                # sharded engine: stream batch over dp, KV heads over tp
                # — every chunk below runs SPMD with explicit state
                # layouts (not just weight-sharding propagation).
                from ..parallel.mesh import shard_gen_state
                state = shard_gen_state(state, self.mesh)
            else:
                # Ragged batches (B not divisible by dp) fall back to
                # GSPMD propagation from the weight shardings alone —
                # a silently different (likely slower) layout, so say so.
                _log(f"[shard] batch {B} not divisible by dp={dp}: "
                     f"generation state left to GSPMD propagation "
                     f"(pad the batch to a multiple of {dp} for the "
                     f"explicit dp layout)")
        consts = make_consts(prefill, p.temperature, p.repetition_penalty)

        frames: list[list[np.ndarray]] = [[] for _ in range(B)]
        audio_parts: list[list[np.ndarray]] = [[] for _ in range(B)]
        t_decode = 0.0
        n_chunks = -(-p.max_audio_tokens // CHUNK_FRAMES)
        greedy = p.temperature <= 0.0

        # Pipelined dispatch: generation chunk k is enqueued BEFORE the
        # host reads chunk k-1's codes and runs the vocoder, so the device
        # queue is never empty between chunks (gen k-1 | voc k-2 | gen k |
        # voc k-1 | ... back-to-back). The reference decodes synchronously
        # inside its frame callback instead (qwen3_tts.cpp:440-452).
        # Attention read-window coverage is tracked HOST-side (as the
        # serving ring does via _steps_done, serve.py): no stream's
        # n_past can exceed the padded prefill length plus the frames
        # dispatched so far, so no blocking np.asarray(state.n_past)
        # read lands between chunk dispatches — the device queue stays
        # full, and no device error can surface mid-dispatch at a
        # readback this function didn't need (bench_r3_b224's OOM did).
        prefill_cov = prefill.prefill_embd.shape[1]
        steps_dispatched = 0

        def dispatch(state):
            nonlocal steps_dispatched
            read_ctx = ctx_bucket(prefill_cov + steps_dispatched,
                                  CHUNK_FRAMES, max_ctx)
            steps_dispatched += CHUNK_FRAMES
            return generate_chunk(
                self.talker_w, cfg, state, consts, p.top_k, CHUNK_FRAMES,
                greedy=greedy, read_ctx=read_ctx, lockstep=True,
                top_p=p.top_p)

        state, codes_d, valid_d = dispatch(state)
        chunk_idx = 1
        while True:
            # sync on the in-flight chunk's completion, then immediately
            # re-fill the device queue with the next one
            done_h = np.asarray(state.done)
            if chunk_idx < n_chunks and not done_h.all():
                state, codes_next, valid_next = dispatch(state)
            else:
                codes_next = valid_next = None
            codes_h = np.asarray(codes_d)        # [chunk, B, 16]
            valid_h = np.asarray(valid_d)        # [chunk, B]
            for b in range(B):
                got = codes_h[valid_h[:, b], b]
                have = sum(len(f) for f in frames[b])
                if have + len(got) > p.max_audio_tokens:
                    got = got[:p.max_audio_tokens - have]
                if len(got):
                    frames[b].append(got)
            if p.streaming_vocoder and self.voc_w is not None:
                td0 = _now_ms()
                self._decode_streaming(frames, audio_parts, on_chunk)
                t_decode += _now_ms() - td0
            if codes_next is None:
                break
            codes_d, valid_d = codes_next, valid_next
            chunk_idx += 1
        t_gen = _now_ms() - t0 - t_decode

        # 3. vocoder decode (full-sequence when not streaming,
        # qwen3_tts.cpp:493-529)
        td0 = _now_ms()
        for b in range(B):
            if b in bad:
                continue
            fr = (np.concatenate(frames[b], axis=0)
                  if frames[b] else np.zeros((0, cfg.n_codebooks), np.int32))
            results[b].n_frames = len(fr)
            if len(fr) == 0:
                results[b].error_msg = "No speech codes generated"
                continue
            if self.voc_w is None:
                results[b].error_msg = "Vocoder not loaded"
                continue
            if p.streaming_vocoder:
                self._flush_streaming(b, frames, audio_parts, on_chunk)
                results[b].audio = self._pcm_parts_to_f32(audio_parts[b])
            else:
                results[b].audio = self.decode_codes(fr)
            results[b].sample_rate = self.voc_cfg.sample_rate
            results[b].success = True
        t_decode += _now_ms() - td0

        timer.add("Code generation", t_gen)
        timer.add("Vocoder decode", t_decode)
        mem = memory_snapshot()
        rss = mem["rss_peak_bytes"]
        dev = mem["device_bytes_in_use"]
        for r in results:
            r.t_tokenize_ms = t_tok
            r.t_generate_ms = t_gen
            r.t_decode_ms = t_decode
            r.t_total_ms = _now_ms() - t_total0
            r.mem_rss_peak_bytes = rss
            r.device_mem_bytes = dev
        if p.print_timing and results and results[0].success:
            audio_sec = sum(len(x.audio) for x in results) / \
                results[0].sample_rate
            timer.report(audio_seconds=audio_sec)
            _log(f"  Streams:         {len(results)}")
            _log(f"  RSS peak:        {rss/2**20:.0f} MB; "
                 f"device mem: {dev/2**20:.0f} MB")
        return results

    # -- vocoder paths ---------------------------------------------------
    def decode_codes(self, frames: np.ndarray,
                     trim: str = "both") -> np.ndarray:
        """Full-sequence decode of [F, 16] codes (GGML-path behavior)."""
        codes = jnp.asarray(frames[None], jnp.int32)
        return np.asarray(vocoder.vocoder_decode(self.voc_w, self.voc_cfg,
                                                 codes, trim)[0])

    def decode_codes_chunked(self, frames: np.ndarray,
                             chunk: int = CHUNK_FRAMES) -> np.ndarray:
        """Independent fixed-size chunk decode: the TRT-path behavior
        (trt_vocoder.cpp:98-170) — each chunk is zero-padded to `chunk`
        frames, decoded with no history, and exactly k*samples_per_frame
        samples kept per k-frame chunk (trt_vocoder.cpp:151-166), so the
        total is len(frames)*1920 like the reference binary."""
        out = []
        for off in range(0, len(frames), chunk):
            part = frames[off:off + chunk]
            k = len(part)
            padded = np.zeros((chunk, frames.shape[1]), np.int32)
            padded[:k] = part
            audio = self.decode_codes(padded, trim="causal")
            valid = vocoder.vocoder_output_length(self.voc_w, self.voc_cfg,
                                                  k, trim="causal")
            out.append(audio[:valid])
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    # Vocoder activations at the 76k-sample tail stages are large; cap the
    # decode batch and split bigger waves (B=96 OOMs on v5e otherwise).
    VOC_MAX_BATCH = 48

    # Decode-batch buckets: a mostly-idle server decodes 1 ready stream at
    # bucket-1 cost instead of padding to the full slot count; one
    # compiled vocoder graph per bucket.
    VOC_BUCKETS = (1, 4, 8, 16, 32, 64, 128)

    def voc_bucket(self, n_ready: int, cap: int) -> int:
        """Smallest decode-batch bucket covering n_ready, capped at the
        serving batch size."""
        for b in self.VOC_BUCKETS:
            if n_ready <= b < cap:
                return b
        return cap

    def _decode_chunk_batch(self, codes: np.ndarray,
                            pcm16: bool = False,
                            max_batch: int | None = None):
        """[n, CHUNK, 16] -> [n, CHUNK*1920] (causal/TRT sample
        arithmetic); split into sub-batches of max_batch (default
        VOC_MAX_BATCH) to bound activation memory — callers with bigger
        resident state (the continuous batcher) pass a smaller cap
        per-call rather than mutating this shared engine.

        pcm16=True (serving fast path): returns a DEVICE int16 array —
        the host readback is deferred until the audio is consumed, so
        the device->host transfer overlaps subsequent device compute
        and moves half the bytes (int16 is the WAV payload anyway)."""
        n = len(codes)
        cap = self.VOC_MAX_BATCH if max_batch is None else max_batch
        codes_j = jnp.asarray(codes, jnp.int32)
        if n <= cap:
            out = self._voc_fn(n, codes.shape[1], None, pcm16)(
                self.voc_w, codes_j)
            return out if pcm16 else np.asarray(out)
        # one dispatch for the whole wave: lax.map over the largest
        # sub-batch size dividing n (dispatches through the axon tunnel
        # cost 1-200 ms each; a python loop of sub-batches was measured
        # 3.5x slower than its own compute under tunnel load)
        sub = next(d for d in (cap, 32, 16, 8, 4, 2, 1)
                   if d <= cap and n % d == 0)
        out = self._voc_fn(n, codes.shape[1], sub, pcm16)(
            self.voc_w, codes_j)
        return out if pcm16 else np.asarray(out)

    # -- AOT executable cache (runtime/aot.py) -------------------------
    @property
    def aot(self):
        """Serving-hot executables (vocoder decode buckets, generation
        chunks, admissions) serialize to disk so a fresh process skips
        the 20-70 s remote-tunnel compiles — the TPU analogue of the
        reference shipping prebuilt TRT engines (trt_vocoder.cpp:26-96,
        trt_code_predictor.cpp:89-166). QWEN3_TTS_AOT=0 disables."""
        cache = getattr(self, "_aot_cache", None)
        if cache is None:
            from .aot import AotCache
            cache = self._aot_cache = AotCache()
        return cache

    def model_tag(self) -> str:
        """Short stable tag of model dims + weight dtypes: part of every
        AOT artifact key so artifacts never collide across configs."""
        tag = getattr(self, "_model_tag", None)
        if tag is None:
            import hashlib
            import jax as _jax
            dt = [str(_jax.tree.leaves(w)[0].dtype) if w else "na"
                  for w in (self.voc_w, self.talker_w)]
            src = repr((self.talker_cfg, self.voc_cfg, dt))
            tag = self._model_tag = hashlib.md5(
                src.encode()).hexdigest()[:8]
        return tag

    def _voc_fn(self, n: int, frames: int, sub: int | None, pcm16: bool):
        """Memoized AOT-cached executable for one causal chunk-decode
        shape. Dynamic args at call time: (voc_w, codes)."""
        memo = getattr(self, "_voc_execs", None)
        if memo is None:
            memo = self._voc_execs = {}
        mkey = (n, frames, sub, pcm16)
        fn = memo.get(mkey)
        if fn is not None:
            return fn
        ex = jnp.zeros((n, frames, self.voc_cfg.n_codebooks), jnp.int32)
        key = (f"voc-{self.model_tag()}-n{n}-f{frames}-s{sub or 0}"
               f"-p{int(pcm16)}")
        if sub is None:
            fn = self.aot.get_or_compile(
                key, vocoder.vocoder_decode, self.voc_w, self.voc_cfg,
                ex, trim="causal", pcm16=pcm16)
        else:
            fn = self.aot.get_or_compile(
                key, vocoder.vocoder_decode_subbatched, self.voc_w,
                self.voc_cfg, ex, trim="causal", pcm16=pcm16, sub=sub)
        memo[mkey] = fn
        return fn

    @property
    def _readback_pool(self):
        """One background thread for device->host audio transfers: the
        dispatch thread never blocks on them, so transfers overlap device
        compute (critical when the host link is thin)."""
        pool = getattr(self, "_rb_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            pool = self._rb_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="audio-readback")
        return pool

    def readback_submit(self, dev_audio):
        """Schedule ONE whole-batch [nb, T] int16 transfer; returns a
        Future of the host array."""
        return self._readback_pool.submit(np.asarray, dev_audio)

    @staticmethod
    def _pcm_parts_to_f32(parts) -> np.ndarray:
        """Resolve deferred chunk readbacks -> one host f32 waveform
        (value = i / 32767, inverting vocoder_decode's pcm16)."""
        if not parts:
            return np.zeros(0, np.float32)
        rows = [p.resolve() if isinstance(p, PCMRef) else np.asarray(p)
                for p in parts]
        return np.concatenate(rows).astype(np.float32) / 32767.0

    @staticmethod
    def _pcm_to_f32(part) -> np.ndarray:
        part = part.resolve() if isinstance(part, PCMRef) else np.asarray(part)
        return part.astype(np.float32) / 32767.0

    @staticmethod
    def _slice_pieces(pieces, start: int, count: int) -> np.ndarray:
        """rows [start, start+count) of the virtual concatenation of
        `pieces` — without materializing the whole history every wave
        (that re-concat was O(total_frames^2) host work per stream)."""
        out, seen, end = [], 0, start + count
        for arr in pieces:
            a0, a1 = seen, seen + len(arr)
            seen = a1
            if a1 <= start:
                continue
            if a0 >= end:
                break
            out.append(arr[max(0, start - a0):end - a0])
        return out[0] if len(out) == 1 else np.concatenate(out)

    def _decode_streaming(self, frames, audio_parts, on_chunk) -> None:
        """Decode every stream that has accumulated a full 40-frame chunk,
        batched across streams (one [n, 40] vocoder call per wave).
        Audio stays on-device as int16 slices until consumed."""
        n_cb = self.talker_cfg.n_codebooks
        while True:
            ready: list[tuple[int, np.ndarray]] = []
            for b in range(len(frames)):
                total = sum(len(f) for f in frames[b])
                done = len(audio_parts[b]) * CHUNK_FRAMES
                if total - done >= CHUNK_FRAMES:
                    ready.append((b, self._slice_pieces(
                        frames[b], done, CHUNK_FRAMES)))
            if not ready:
                return
            nb = self.voc_bucket(len(ready), len(frames))
            batch = np.zeros((nb, CHUNK_FRAMES, n_cb), np.int32)
            for i, (_, part) in enumerate(ready):
                batch[i] = part
            audio = self._decode_chunk_batch(batch, pcm16=True)
            fut = self.readback_submit(audio)
            for i, (b, _) in enumerate(ready):
                ref = PCMRef(fut, i)
                audio_parts[b].append(ref)
                if on_chunk:
                    on_chunk(b, self._pcm_to_f32(ref))

    def _flush_streaming(self, b, frames, audio_parts, on_chunk) -> None:
        """Decode the ragged tail (< 40 frames) of stream b, zero-padded to
        the fixed chunk — the TRT-path flush behavior
        (trt_vocoder.cpp:109-166, tts_transformer.cpp:2562-2570)."""
        full = np.concatenate(frames[b]) if frames[b] else None
        if full is None:
            return
        done = len(audio_parts[b]) * CHUNK_FRAMES
        if done < len(full):
            part = full[done:]
            k = len(part)
            nb = self.voc_bucket(1, len(frames))
            batch = np.zeros((nb, CHUNK_FRAMES, full.shape[1]), np.int32)
            batch[0, :k] = part
            audio = self._decode_chunk_batch(batch, pcm16=True)
            valid = vocoder.vocoder_output_length(self.voc_w, self.voc_cfg,
                                                  k, trim="causal")
            ref = PCMRef(self.readback_submit(audio), 0, valid)
            audio_parts[b].append(ref)
            if on_chunk:
                on_chunk(b, self._pcm_to_f32(ref))
