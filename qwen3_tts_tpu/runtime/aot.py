"""AOT executable cache: serialize compiled XLA/Mosaic executables to disk.

The reference never compiles at serve time — it deserializes prebuilt TRT
engines (trt_vocoder.cpp:26-96, trt_code_predictor.cpp:89-166). This is
the TPU analogue: `jax.experimental.serialize_executable` pickles the
fully-compiled executable (Pallas kernels included — which the XLA
persistent compile cache does NOT capture on this platform, NOTES.md), so
a fresh serving process loads the serving set in seconds instead of
paying ~50 s per vocoder bucket through the remote-compile tunnel.

Artifacts are keyed by a caller-supplied name plus a fingerprint of the
jax version, device kind, and a content hash of the package sources (so
code edits invalidate artifacts); a stale or incompatible artifact falls
back to a normal compile (graceful degradation, the reference's policy
for missing engines, qwen3_tts.cpp:193-196).

Usage:
    cache = AotCache()                       # default .aot_cache dir
    fn = cache.get_or_compile("gen_b160_rc512", generate_chunk,
                              w, cfg, state, consts, 50, 40,
                              read_ctx=512, ring=True)
    state, codes, valid = fn(w, state, consts)   # DYNAMIC args only

Compiled executables take only the DYNAMIC arguments (the jit wrapper's
static args — cfg, chunk size, flags — are baked into the artifact), so
the returned callable is invoked with the dynamic subset, in the original
order. Donation semantics are preserved.

TRUST BOUNDARY: artifacts are pickles (jax's serialize_executable is
itself pickle-based), and unpickling executes arbitrary code — the cache
directory must be treated like the code itself. Anyone who can write to
it (or set QWEN3_TTS_AOT_DIR to a directory they control) can execute
code in the serving process. The default dir lives next to the package
checkout and is created mode 0700; do NOT point QWEN3_TTS_AOT_DIR at a
shared or world-writable location. The reference has the same property
with its .trt engine files (deserialized native code,
trt_code_predictor.cpp:89-166) — engines there, executables here.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import time
from pathlib import Path

import jax

# Default next to the package checkout (…/qwen3_tts_tpu/../.aot_cache),
# not a hardcoded absolute path — a wrong location silently disables
# persistence (every process would pay the full ~9 min compile set).
_PKG_DIR = Path(__file__).resolve().parents[1]
DEFAULT_DIR = os.environ.get("QWEN3_TTS_AOT_DIR",
                             str(_PKG_DIR.parent / ".aot_cache"))


def _log(msg: str) -> None:
    print(f"  [aot] {msg}", file=sys.stderr, flush=True)


def _source_hash() -> str:
    """Content hash of the package's .py sources: editing model/runtime
    code must invalidate artifacts, else a fixed bug keeps executing from
    the stale pre-fix executable with no error."""
    h = hashlib.sha1()
    for p in sorted(_PKG_DIR.rglob("*.py")):
        h.update(p.relative_to(_PKG_DIR).as_posix().encode())
        h.update(p.read_bytes())
    return h.hexdigest()[:10]


def _host_cpu_hash() -> str:
    """Fingerprint of the host CPU's feature flags. XLA:CPU AOT
    executables are compiled FOR the build host's microarchitecture;
    deserializing one on a host with different features dispatches
    broken code ("Function ... not found" / SIGILL) instead of failing
    the load cleanly. TPU executables are device binaries and do not
    depend on the host, so only the cpu platform keys on this."""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    return hashlib.sha1(line).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


def _fingerprint() -> str:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform).replace(" ", "_")
    host = f"-h{_host_cpu_hash()}" if dev.platform == "cpu" else ""
    return f"{jax.__version__}-{dev.platform}-{kind}{host}-{_source_hash()}"


class _LoadedExec:
    """Wraps a deserialized Compiled: callable with the original
    (flattened-tree) signature."""

    __slots__ = ("compiled",)

    def __init__(self, compiled):
        self.compiled = compiled

    def __call__(self, *args, **kwargs):
        return self.compiled(*args, **kwargs)


class AotCache:
    def __init__(self, cache_dir: str | Path | None = None,
                 enabled: bool | None = None):
        self.dir = Path(cache_dir or DEFAULT_DIR)
        env = os.environ.get("QWEN3_TTS_AOT", "1")
        self.enabled = (env != "0") if enabled is None else enabled
        self._fp = None
        # In-process memo: a key this process already compiled (or loaded)
        # is returned live instead of round-tripping through disk — the
        # XLA:CPU backend cannot dispatch an executable deserialized in
        # the same process that serialized it ("Function ..._fusion not
        # found"), and on TPU a deserialize costs 0.2-1.2 s per artifact.
        self._mem: dict[str, _LoadedExec] = {}

    @property
    def fingerprint(self) -> str:
        if self._fp is None:
            self._fp = _fingerprint()
        return self._fp

    def _path(self, key: str) -> Path:
        return self.dir / f"{key}-{self.fingerprint}.jaxexec"

    _cc_disabled = False

    @classmethod
    def _quarantine_compile_cache(cls) -> None:
        """XLA:CPU's AOT function registry is process-global: an
        executable LOADED from jax's persistent compile cache after any
        deserialize_and_load in the same process dispatches "Function
        <fusion> not found" (fusion function names like
        multiply_select_fusion collide; minimal repro in NOTES.md
        round 4). Invariant enforced here: once this process
        deserializes an artifact on the cpu backend, no further
        persistent-cache loads may happen — disable the cache for the
        rest of the process. TPU executables are device binaries and
        unaffected (round-3 warm starts ran both caches together)."""
        if cls._cc_disabled or jax.default_backend() != "cpu":
            return
        if jax.config.jax_enable_compilation_cache:
            jax.config.update("jax_enable_compilation_cache", False)
            _log("cpu backend: persistent compile cache disabled for "
                 "the rest of the process (AOT deserialize is "
                 "incompatible with later cache loads)")
        cls._cc_disabled = True

    def load(self, key: str):
        """Load a serialized executable; None if absent/incompatible."""
        if not self.enabled:
            return None
        path = self._path(key)
        if not path.exists():
            return None
        try:
            t0 = time.monotonic()
            self._quarantine_compile_cache()
            from jax.experimental.serialize_executable import (
                deserialize_and_load)
            with open(path, "rb") as f:
                blob, in_tree, out_tree, device_ids = pickle.load(f)
            # reconstruct on the devices the executable was built for —
            # the default (all client devices) breaks on multi-device
            # hosts when the program was compiled single-device
            by_id = {d.id: d for d in jax.devices()}
            devs = [by_id[i] for i in device_ids if i in by_id]
            if len(devs) != len(device_ids):
                devs = jax.devices()[:len(device_ids)]
            compiled = deserialize_and_load(blob, in_tree, out_tree,
                                            execution_devices=devs)
            _log(f"loaded {key} ({path.stat().st_size >> 20} MiB, "
                 f"{time.monotonic()-t0:.1f} s)")
            return _LoadedExec(compiled)
        except Exception as e:  # stale/incompatible artifact -> recompile
            _log(f"load of {key} failed ({type(e).__name__}: "
                 f"{str(e)[:120]}); recompiling")
            try:
                path.unlink()
            except OSError:
                pass
            return None

    def save(self, key: str, compiled) -> bool:
        if not self.enabled:
            return False
        try:
            from jax.experimental.serialize_executable import serialize
            blob, in_tree, out_tree = serialize(compiled)
            try:
                device_ids = [d.id for d in
                              compiled._executable.xla_executable
                              .local_devices()]
            except AttributeError:
                device_ids = [d.id for d in jax.devices()]
            # 0700: the cache is a code-execution surface (see module
            # docstring) — never group/world writable
            self.dir.mkdir(parents=True, exist_ok=True, mode=0o700)
            path = self._path(key)
            # pid-suffixed temp: concurrent warmups on one host must not
            # interleave writes into the same temp file (os.replace is
            # then atomic per writer; last publisher wins)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump((blob, in_tree, out_tree, device_ids), f)
            os.replace(tmp, path)
            _log(f"saved {key} ({path.stat().st_size >> 20} MiB)")
            return True
        except Exception as e:
            _log(f"save of {key} failed ({type(e).__name__}: "
                 f"{str(e)[:120]})")
            return False

    def get_or_compile(self, key: str, jitted_fn, *args, retries: int = 2,
                       **kwargs):
        """Return a callable for `jitted_fn` at these arg shapes: the
        deserialized artifact when present, else lower+compile (and
        persist). Call the result with the DYNAMIC args only (static
        jit args are baked into the executable).

        Compiles are retried (the axon remote-compile helpers return
        flaky HTTP 500s on ~40% of Pallas compiles, NOTES.md; a retry
        usually succeeds)."""
        hit = self._mem.get(key)
        if hit is not None:
            return hit
        hit = self.load(key)
        if hit is not None:
            self._mem[key] = hit
            return hit
        t0 = time.monotonic()
        # XLA:CPU executables LOADED from jax's persistent compile cache
        # do not survive a serialize_executable round-trip: the reloaded
        # artifact dispatches "Function compare_broadcast_fusion not
        # found" (companion fusion functions are dropped somewhere in
        # cache-load + re-serialize). Compile fresh with the persistent
        # cache disabled so the serialized artifact is complete. TPU
        # executables are unaffected (device binaries; round-3 warm
        # starts deserialized and ran fine with the cache active).
        fresh = jax.default_backend() == "cpu"
        if fresh:
            prev_cc = jax.config.jax_enable_compilation_cache
            jax.config.update("jax_enable_compilation_cache", False)
        try:
            for attempt in range(retries + 1):
                try:
                    compiled = jitted_fn.lower(*args, **kwargs).compile()
                    break
                except Exception as e:
                    if attempt == retries:
                        raise
                    _log(f"compile of {key} failed ({type(e).__name__}: "
                         f"{str(e)[:120]}); retry {attempt + 1}/{retries}")
                    time.sleep(2.0)
        finally:
            if fresh:
                jax.config.update("jax_enable_compilation_cache", prev_cc)
        _log(f"compiled {key} ({time.monotonic()-t0:.1f} s)")
        self.save(key, compiled)
        out = _LoadedExec(compiled)
        self._mem[key] = out
        return out
