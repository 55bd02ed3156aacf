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
if not _os.environ.get("STARK_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "STARK_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          _os.pardir, ".jax_cache"),
        ),
    )
    # persist EVERYTHING: the prove dispatches ~40 small programs that
    # compile in 2-4 s each — above any useful work threshold but below
    # jax's 5 s default, so warm starts re-paid ~100 s of small compiles
    # (measured 2026-08-20: no-mega first prove 113 s with a fully warm
    # program cache; mega first 11 s because its ONE big program did
    # persist).  Disk cost is a few hundred MB, irrelevant here.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
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
