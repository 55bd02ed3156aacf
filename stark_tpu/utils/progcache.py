"""Disk cache of serialized lowered programs — the cold-start layer the
XLA persistent cache cannot touch.

A cold prove pays two distinct costs per program:

  1. Python tracing + lowering (GIL-bound; ~2-14 s for the fused FRI
     layer programs — benches/probe_cold_r4.txt shows 21 prewarm jobs
     serializing to a 65 s first prove THROUGH a warm XLA cache);
  2. XLA/Mosaic compilation (C++; covered by jax's persistent
     compilation cache, stark_tpu/__init__.py).

This module eliminates (1) on warm starts: the first process to trace a
program exports it (`jax.export`) and writes the serialized StableHLO
artifact to disk; later processes deserialize (~2 ms) and jit the
exported call — whose compilation then hits the XLA persistent cache.

Keying: (program name, static key, input avals, platform) plus a
fingerprint of every ``.py``/``.cpp`` source in the package — ANY code
change invalidates the whole cache, so a stale artifact can never
silently diverge from the Python definition.  Artifacts live next to the
XLA cache (``.jax_cache/programs/``); opt out with
STARK_TPU_NO_PROGRAM_CACHE=1.

Scope: single-device programs only (the cold-start surface).  Sharded
programs keep plain ``jax.jit`` — their cost is dominated by collective
layout search, and exporting shard_map programs pins mesh metadata this
cache does not key on.
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading

import jax

_lock = threading.Lock()


def _cache_dir() -> str | None:
    if os.environ.get("STARK_TPU_NO_PROGRAM_CACHE") or os.environ.get(
            "STARK_TPU_NO_COMPILE_CACHE"):
        return None
    base = os.environ.get("STARK_TPU_COMPILE_CACHE")
    if not base:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.pardir, ".jax_cache")
    return os.path.join(base, "programs")


# Package-relative sources that can NOT change a traced program: harness
# and observability only.  Everything else in the package is hashed, so
# any compute-relevant edit still invalidates every artifact — but an
# edit to the bench tunnel guard or logging no longer throws away a
# cache whose rebuild costs minutes of TPU compile (measured r5: one
# tunnel.py edit turned a 46 s warm-cache first prove into a 225 s
# true-cold one).
_FINGERPRINT_EXCLUDE = {
    "cli.py",
    "__main__.py",
    "__init__.py",  # cache wiring + re-exports only
    "serve.py",     # daemon socket protocol
    os.path.join("utils", "tunnel.py"),
    os.path.join("utils", "regression.py"),
    os.path.join("utils", "logging.py"),
    os.path.join("utils", "metrics.py"),
    os.path.join("utils", "prewarm.py"),
}


@functools.cache
def _source_fingerprint() -> str:
    """SHA-256 over every compute-relevant source file in the package,
    so any code edit that could alter a traced program invalidates every
    cached artifact (correctness beats reuse); pure-harness modules are
    excluded (see _FINGERPRINT_EXCLUDE)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    names = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith((".py", ".cpp", ".h")):
                rel = os.path.relpath(os.path.join(root, fn), pkg)
                if rel not in _FINGERPRINT_EXCLUDE:
                    names.append(rel)
    for rel in sorted(names):
        h.update(rel.encode())
        with open(os.path.join(pkg, rel), "rb") as fh:
            h.update(fh.read())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def _avals_key(args) -> str:
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{dtype}{tuple(shape)}")
    return ";".join(parts)


def _platform(args=()) -> str:
    """Where the computation will actually run: the platform of the
    first device-placed argument (a `--cpu` run on a TPU-default machine
    must export for cpu — the default backend would say tpu), falling
    back to the default device's platform."""
    for leaf in jax.tree.leaves(args):
        devices = getattr(leaf, "devices", None)
        if callable(devices):
            try:
                return next(iter(leaf.devices())).platform
            except Exception:
                pass
    try:
        dflt = jax.config.jax_default_device
        if dflt is not None:
            return dflt.platform
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


# populated for cold-start probes: name -> "hit" | "miss" | "off"
LAST_EVENTS: dict = {}


class CachedJit:
    """``jax.jit(fn)`` whose traced form round-trips through a disk
    cache of serialized ``jax.export`` artifacts.

    First call in a process resolves ONE of:

    * disk hit: deserialize (~ms, no tracing) and jit the exported call;
    * disk miss: export (traces once), persist, jit the exported call —
      so every process, first or not, compiles the SAME artifact and the
      XLA persistent cache key stays stable across processes.

    Falls back to plain jit when caching is disabled, off-TPU-default
    platforms are fine too (the key includes the platform).
    """

    def __init__(self, fn, name: str, static_key=()):
        self._fn = fn
        self._name = name
        self._static_key = static_key
        # exported artifacts are shape-committed: resolve per input-aval
        # signature (callers' lru keys usually pin shapes already, but a
        # shared instance must never feed mismatched shapes to one export)
        self._callables: dict = {}

    def _key_path(self, args) -> str | None:
        d = _cache_dir()
        if d is None:
            return None
        raw = "|".join([
            self._name, repr(self._static_key), _avals_key(args),
            _platform(args), _source_fingerprint(),
        ])
        digest = hashlib.sha256(raw.encode()).hexdigest()[:32]
        return os.path.join(d, f"{self._name}-{digest}.jexp")

    def _resolve(self, args):
        from jax import export as jex

        path = self._key_path(args)
        if path is None:
            LAST_EVENTS[self._name] = "off"
            return jax.jit(self._fn)
        exp = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    exp = jex.deserialize(bytearray(fh.read()))
                LAST_EVENTS[self._name] = "hit"
            except Exception:
                exp = None  # stale/corrupt artifact: re-export below
        if exp is None:
            LAST_EVENTS[self._name] = "miss"
            try:
                exp = jex.export(
                    jax.jit(self._fn),
                    platforms=[_platform(args)],
                    disabled_checks=[
                        jex.DisabledSafetyCheck.custom_call(c)
                        for c in ("tpu_custom_call", "Sharding",
                                  "annotate_device_placement")
                    ],
                )(*args)
                blob = exp.serialize()
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(bytes(blob))
                os.replace(tmp, path)
            except Exception:
                # export unsupported for this program (exotic primitive,
                # non-exportable custom call): plain jit, no cache
                LAST_EVENTS[self._name] = "off"
                return jax.jit(self._fn)
        return jax.jit(exp.call)

    def _cacheable(self, args) -> bool:
        """Only concrete single-device inputs: exporting under an outer
        trace is not supported, and an Exported carries no sharding
        metadata, so sharded global arrays must keep plain jit (GSPMD
        partitions the original program instead)."""
        for leaf in jax.tree.leaves(args):
            if isinstance(leaf, jax.core.Tracer):
                return False
            sharding = getattr(leaf, "sharding", None)
            if sharding is not None:
                try:
                    if len(sharding.device_set) > 1:
                        return False
                except Exception:
                    pass
        return True

    def __call__(self, *args):
        if not self._cacheable(args):
            fn = self._callables.get("plain")
            if fn is None:
                fn = self._callables["plain"] = jax.jit(self._fn)
            return fn(*args)
        sig = _avals_key(args)
        fn = self._callables.get(sig)
        if fn is None:
            with _lock:
                fn = self._callables.get(sig)
                if fn is None:
                    fn = self._resolve(args)
                    self._callables[sig] = fn
        return fn(*args)


def fn_digest(fn) -> str | None:
    """Best-effort stable digest of a constraint callable's bytecode —
    lets declarative-AIR compose programs key on what the lambda actually
    computes, not just the spec's registry name (two specs sharing a name
    but differing in code must never share a cached program)."""
    if fn is None:
        return None
    try:
        code = fn.__code__
        h = hashlib.sha256(code.co_code)
        h.update(repr(code.co_consts).encode())
        for name, cell in zip(code.co_freevars, fn.__closure__ or ()):
            h.update(name.encode())
            v = cell.cell_contents
            if isinstance(v, (int, float, str, bytes, bool, type(None),
                              tuple)):
                h.update(repr(v).encode())
            elif callable(v):  # e.g. auto-derived transitions close over step
                h.update(str(fn_digest(v)).encode())
        return h.hexdigest()[:16]
    except Exception:
        return repr(fn)


def cached_jit(fn, name: str, static_key=()) -> CachedJit:
    """Drop-in for ``jax.jit(fn)`` at single-device call sites whose
    tracing cost matters cold (FRI layers, tree builds, query programs).
    The caller's own lru_cache keys (p, m, ...) should be passed as
    `static_key` so distinct programs never share an artifact."""
    return CachedJit(fn, name, static_key)
