"""stark_tpu — a TPU-native STARK proving framework.

A from-scratch JAX/XLA/Pallas implementation of the full STARK pipeline the
reference Rust crate (`stark-101`, /root/reference) defines or intended:

    prime field  ->  trace  ->  LDE (NTT)  ->  composition polynomial
                 ->  Merkle commitment  ->  Fiat-Shamir channel
                 ->  FRI commit / fold / query  ->  proof

Design principles (TPU-first, not a port):

* All device field math is pure ``uint32`` — modular mul via 16-bit limb
  decomposition + Montgomery reduction, so the same code runs in plain XLA
  and inside Pallas kernels without 64-bit emulation.
* Polynomials live in *evaluation form* on 2-adic cosets; coefficients
  appear only through NTT/INTT (Stockham autosort — no bit-reversal
  gathers, every stage is reshape/slice/elementwise, which XLA fuses).
* The Fiat-Shamir transcript is host-side and byte-exact with the
  reference's ``Channel`` (hex-string SHA-256 state machine,
  reference: src/channel/channel.rs:35-84).
* Merkle trees hash on-device (batched SHA-256 over lanes, a pure VPU
  workload); roots/auth paths are extracted host-side with rs_merkle's
  exact node semantics (reference: src/merkle/mod.rs:10-26).
* Multi-chip: the evaluation domain is sharded over a ``jax.sharding.Mesh``;
  the distributed NTT is the four-step algorithm (local NTT + twiddle +
  all-to-all transpose + local NTT) riding ICI.
"""

import os as _os

# Persistent XLA/Mosaic compilation cache: first-time TPU compiles of the
# fused kernels take tens of seconds (via this environment's remote
# compile helper); the cache makes them one-time per machine.  Opt out
# with STARK_TPU_NO_COMPILE_CACHE=1.
def _machine_fingerprint() -> str:
    """Short digest of this host's CPU identity (arch + ISA flags).

    Serialized XLA:CPU executables embed the compile machine's ISA
    features; loading one on a different host risks SIGILL (the r4
    driver artifacts were full of the loader's feature-mismatch
    warnings).  CPU-backend cache dirs are scoped by this digest so an
    artifact can only ever be loaded on a machine whose CPU features
    match the one that compiled it.  TPU executables are keyed by device
    kind inside XLA's own cache key and stay shared.
    """
    import hashlib as _hashlib
    import platform as _platform

    h = _hashlib.sha256(_platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as _fh:
            for _ln in _fh:
                if _ln.startswith(("flags", "Features")):
                    h.update(_ln.encode())
                    break
    except OSError:
        h.update(_platform.processor().encode())
    return h.hexdigest()[:12]


def _is_cpu_default() -> bool:
    """True when this process will default to the CPU backend (no TPU
    tunnel configured, or JAX_PLATFORMS pins cpu) — decided from env
    only, so no backend is initialised at import time."""
    plat = _os.environ.get("JAX_PLATFORMS", "")
    if plat:
        return plat.split(",")[0].strip() == "cpu"
    return not _os.environ.get("PALLAS_AXON_POOL_IPS")


if not _os.environ.get("STARK_TPU_NO_COMPILE_CACHE") and not _is_cpu_default():
    # TPU sessions only.  CPU-default sessions (tests, dryrun, local
    # verification) get NO XLA persistent cache at all: XLA:CPU
    # executable serialization is unsound in this jaxlib — writes can
    # SEGFAULT in put_executable_and_time once a process holds the
    # suite's hundreds of live executables, and *reads* load AOT results
    # whose compile-machine pseudo-features (+prefer-no-scatter/gather)
    # never match the host probe (cpu_aot_loader warns "could lead to
    # execution errors such as SIGILL" on every load; the r5 full-suite
    # SIGABRT at tests/test_fri.py persisted with writes disabled but
    # reads on).  Local CPU compiles are sub-second — the cache bought
    # nothing there anyway.  The jax.export program cache
    # (utils/progcache) is separate and stays on for both platforms.
    import jax as _jax

    _cache_base = _os.environ.get(
        "STARK_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      _os.pardir, ".jax_cache"),
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_base)
    # persist EVERYTHING (threshold 0): the prove dispatches ~40 small
    # programs that compile in 2-4 s each — above any useful work
    # threshold but below jax's 5 s default, so warm starts re-paid
    # ~100 s of small compiles (measured 2026-08-20: no-mega first prove
    # 113 s with a fully warm program cache; mega first 11 s because its
    # ONE big program did persist), and a warm 2^14 prove still re-paid
    # ~11 sub-second jit_reshape compiles (~0.5 s each through the
    # tunneled compile service) under threshold 1
    # (benches/probe_warmcompile_r5).  STARK_TPU_CACHE_WRITE_THRESHOLD
    # overrides.
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        int(_os.environ.get("STARK_TPU_CACHE_WRITE_THRESHOLD", "0")))
    # Also persist the backend-specific (Mosaic/Pallas) compilation
    # artifacts: measured on the tunneled v5e (benches/probe_compile_r3
    # session, 2026-08-19), a 2^21-node SHA kernel's second-process
    # compile drops 17.0 s -> 7.6 s with this on — the r2 finding that
    # "the persistent cache does not cover Mosaic" was this flag's
    # default, not a backend limitation.
    try:
        _jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # older jax without the knob: cache still works
        pass

from stark_tpu.fields import FieldElement, Fp
from stark_tpu.config import ProverConfig, DEFAULT_MODULUS, DEFAULT_GENERATOR

__version__ = "0.1.0"

__all__ = [
    "FieldElement",
    "Fp",
    "ProverConfig",
    "DEFAULT_MODULUS",
    "DEFAULT_GENERATOR",
]
