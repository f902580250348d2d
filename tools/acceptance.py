#!/usr/bin/env python3
"""Real-weight acceptance run: ONE command that validates the whole stack
the moment checkpoints are available.

The reference proves its numerics against the PyTorch source of truth at
export time (export_code_predictor.py:315-331,
convert_code_predictor_to_coreml.py:297-347) and publishes audio numbers
(README.md:100-109). This environment has no weights or network, so that
check cannot run here — this tool packages the full acceptance sequence
so it executes unattended the moment weights appear:

  1. convert   HF checkpoints -> GGUF model dir (tools/convert_checkpoints)
  2. parity    per-stage activation diff vs an independent torch reference
               (tools/parity.py; export-time-check analogue)
  3. tokenizer golden vectors — the exact ids from the reference's test
               (tests/test_tokenizer.cpp:13-15): encode("Hello.") must
               contain [9707, 13] and encode_for_tts("Hello.") must equal
               [151644, 77091, 198, 9707, 13, 151645, 198,
                151644, 77091, 198]; round-trip decode
  4. synth     load_models -> synthesize (greedy) -> WAV: sample-count
               arithmetic (n_frames x samples/frame, trt_vocoder.cpp:
               151-166), WAV round-trip, optional duration A/B vs a
               reference WAV
  5. cloning   encode a speaker embedding from the reference WAV
               (.embd cache format parity, main.cpp:38-59)

Every step runs end-to-end on the synthetic fixtures today
(tests/test_acceptance.py); --real additionally enforces the golden
tokenizer vectors, which only hold for the true Qwen2 vocab.

Usage (real weights):
  python tools/acceptance.py --hf-tts <hf_tts_dir> --hf-codec <hf_codec_dir> \
      --work /tmp/accept --real [--ref-wav voice.wav]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

# Golden vectors from the reference's tokenizer test
# (/root/reference/tests/test_tokenizer.cpp:13-15)
GOLDEN_TEXT = "Hello."
GOLDEN_ENCODE_SUBSEQ = [9707, 13]
GOLDEN_ENCODE_FOR_TTS = [151644, 77091, 198, 9707, 13, 151645, 198,
                         151644, 77091, 198]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _check(name: str, ok: bool, detail: str = "") -> dict:
    status = "OK" if ok else "FAIL"
    log(f"[accept] {name}: {status}{(' — ' + detail) if detail else ''}")
    return {"step": name, "ok": bool(ok), "detail": detail}


def run_acceptance(hf_tts: Path, hf_codec: Path, work: Path, *,
                   real: bool = False, ref_wav: Path | None = None,
                   ab_wav: Path | None = None,
                   out_type: str = "f16", text: str = GOLDEN_TEXT,
                   max_tokens: int = 64, parity_timeout: int = 1800,
                   ) -> list[dict]:
    """Run the full acceptance sequence; returns a list of step results.

    real=True additionally enforces the golden tokenizer vectors (valid
    only for the true 151k-token Qwen2 vocab)."""
    import convert_checkpoints as cc

    from qwen3_tts_tpu.runtime import audio_io
    from qwen3_tts_tpu.runtime.pipeline import Qwen3TTS, TTSParams
    from qwen3_tts_tpu.models import vocoder as voc_mod

    results: list[dict] = []
    work.mkdir(parents=True, exist_ok=True)
    mdir = work / "models"
    mdir.mkdir(exist_ok=True)

    # -- 1. convert: the model-dir layout is the reference's contract —
    # load_models opens exactly these names regardless of quantization
    # (qwen3_tts.cpp:117-118)
    tts_gguf = mdir / "qwen3-tts-0.6b-f16.gguf"
    codec_gguf = mdir / "qwen3-tts-tokenizer-f16.gguf"
    cc.convert_tts(Path(hf_tts), tts_gguf, out_type)
    # codec is always f16 — the production setup path pins it there
    # (tools/setup_models.py; the reference ships a -f16 tokenizer GGUF),
    # so acceptance must certify the artifact combination setup emits
    cc.convert_codec(Path(hf_codec), codec_gguf, "f16")
    results.append(_check(
        "convert", tts_gguf.exists() and codec_gguf.exists(),
        f"{tts_gguf.name} ({tts_gguf.stat().st_size >> 20} MiB), "
        f"{codec_gguf.name} ({codec_gguf.stat().st_size >> 20} MiB)"))

    # -- 2. parity vs independent torch reference ------------------------
    try:
        r = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "parity.py"),
             "--tts", str(hf_tts), "--codec", str(hf_codec),
             "--out", str(work / "parity.npz")],
            capture_output=True, text=True, timeout=parity_timeout)
        results.append(_check(
            "parity", r.returncode == 0 and "PARITY OK" in r.stderr,
            r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ""))
    except subprocess.TimeoutExpired:
        # record the failure and keep going — the harness must emit its
        # JSON report unattended even when one step wedges
        results.append(_check(
            "parity", False, f"timed out after {parity_timeout}s"))

    # -- 3. tokenizer golden vectors (from the converted GGUF) -----------
    from qwen3_tts_tpu.io.gguf import GGUFReader
    from qwen3_tts_tpu.tokenizer import TextTokenizer
    with GGUFReader(str(tts_gguf)) as _r:
        tok = TextTokenizer.from_gguf(_r)
    golden_text = GOLDEN_TEXT if real else text
    ids = tok.encode(golden_text)
    tts_ids = tok.encode_for_tts(golden_text)
    roundtrip = tok.decode(ids)
    if real:
        def subseq(needle, hay):
            return any(hay[i:i + len(needle)] == needle
                       for i in range(len(hay) - len(needle) + 1))
        ok = (subseq(GOLDEN_ENCODE_SUBSEQ, list(ids))
              and list(tts_ids) == GOLDEN_ENCODE_FOR_TTS
              and roundtrip == golden_text)
        results.append(_check(
            "tokenizer_goldens", ok,
            f"encode={list(ids)} encode_for_tts={list(tts_ids)}"))
    else:
        # the synthetic fixture's 6-token vocab cannot round-trip spaces
        # (unknown byte tokens are skipped, text_tokenizer.cpp:277-287);
        # only require the encode paths to execute. --real enforces the
        # exact golden ids + round-trip.
        results.append(_check(
            "tokenizer_roundtrip",
            isinstance(roundtrip, str) and len(tts_ids) > 0,
            "synthetic vocab; golden ids enforced with --real"))

    # -- 4. synthesis -> WAV arithmetic ----------------------------------
    tts = Qwen3TTS()
    ok = tts.load_models(str(mdir))
    results.append(_check("load_models", ok, tts.error_msg if not ok else ""))
    params = TTSParams(max_audio_tokens=max_tokens, temperature=0.0,
                       seed=0, print_timing=False)
    res = tts.synthesize(text, params)
    if tts.voc_w is not None:
        expect = voc_mod.vocoder_output_length(tts.voc_w, tts.voc_cfg,
                                               res.n_frames, trim="causal")
        synth_ok = (res.success and res.n_frames >= 1
                    and len(res.audio) == expect)
        detail = (f"{res.n_frames} frames, {len(res.audio)} samples "
                  f"(expect {expect}), {res.t_total_ms:.0f} ms")
    else:  # load_models failed above; record rather than crash on None
        synth_ok, detail = False, "vocoder not loaded"
    results.append(_check("synthesize", synth_ok, detail))

    wav = work / "accept.wav"
    audio_io.save_wav(str(wav), res.audio, res.sample_rate)
    samples, sr = audio_io.load_wav(str(wav))
    q = np.clip(np.round(res.audio * 32767.0), -32768, 32767) / 32768.0
    results.append(_check(
        "wav_roundtrip", sr == res.sample_rate and len(samples) ==
        len(res.audio) and np.allclose(samples, q, atol=1 / 32768),
        f"{len(samples)} samples @ {sr} Hz"))

    if ab_wav is not None:
        # A/B duration vs audio the C++ reference synthesized for the
        # SAME text: greedy runs should land within 25% (frame counts may
        # differ by a few EOS frames)
        ref_samples, ref_sr = audio_io.load_wav(str(ab_wav))
        dur = len(res.audio) / res.sample_rate
        ref_dur = len(ref_samples) / ref_sr
        results.append(_check(
            "duration_ab", 0.75 <= dur / max(ref_dur, 1e-9) <= 1.25,
            f"ours {dur:.2f}s vs reference {ref_dur:.2f}s"))

    if ref_wav is not None:
        # -- 5. voice cloning + .embd cache format -----------------------
        emb = tts.encode_speaker(str(ref_wav))
        embd_path = work / "accept.embd"
        ok = (emb is not None and emb.ndim == 1
              and audio_io.save_embedding(str(embd_path), emb))
        back = audio_io.load_embedding(str(embd_path)) if ok else None
        results.append(_check(
            "speaker_embd", ok and back is not None
            and np.array_equal(back, emb.astype(np.float32)),
            f"{0 if emb is None else len(emb)} floats (raw f32 .embd, "
            "main.cpp:38-59 format)"))
        if emb is None:
            results.append(_check("synthesize_cloned", False,
                                  f"no embedding: {tts.error_msg}"))
        else:
            res_v = tts.synthesize_with_embedding(text, emb, params)
            results.append(_check(
                "synthesize_cloned", res_v.success and res_v.n_frames >= 1,
                f"{res_v.n_frames} frames"))

    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-tts", type=Path, required=True,
                    help="HF checkpoint dir (config.json + safetensors)")
    ap.add_argument("--hf-codec", type=Path, required=True,
                    help="HF speech-codec checkpoint dir")
    ap.add_argument("--work", type=Path, default=Path("accept_work"))
    ap.add_argument("--real", action="store_true",
                    help="enforce the golden tokenizer vectors (real "
                         "Qwen2 vocab only)")
    ap.add_argument("--ref-wav", type=Path, default=None,
                    help="speaker reference WAV: voice-clone + .embd path")
    ap.add_argument("--ab-wav", type=Path, default=None,
                    help="WAV the C++ reference synthesized for --text: "
                         "duration A/B")
    ap.add_argument("--type", default="f16",
                    choices=["f32", "f16", "q8_0", "q4_0", "q4_k"])
    ap.add_argument("--text", default=GOLDEN_TEXT)
    ap.add_argument("--max-tokens", type=int, default=64)
    args = ap.parse_args()

    results = run_acceptance(args.hf_tts, args.hf_codec, args.work,
                             real=args.real, ref_wav=args.ref_wav,
                             ab_wav=args.ab_wav,
                             out_type=args.type, text=args.text,
                             max_tokens=args.max_tokens)
    print(json.dumps(results, indent=2))
    if all(r["ok"] for r in results):
        log(f"ACCEPTANCE OK ({len(results)} steps)")
        return 0
    log("ACCEPTANCE FAILED:")
    for r in results:
        if not r["ok"]:
            log(f"  - {r['step']}: {r['detail']}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
