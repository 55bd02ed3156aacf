"""Golden transcript vectors (SURVEY §7.1.3): frozen serialized proofs in
tests/vectors/.  Any change to transcript bytes — field encoding, channel
hashing, Merkle shape, FRI framing, query order — fails here, separating
deliberate protocol changes from accidental drift."""

import json
import os

import pytest

from stark_tpu.config import ProverConfig, TEST_MODULUS
from stark_tpu.stark import FibMulAIR, MimcAIR, StarkProof, prove, verify

VEC = os.path.join(os.path.dirname(__file__), "vectors", "golden_proofs.json")


@pytest.fixture(scope="module")
def vectors():
    with open(VEC) as fh:
        return json.load(fh)


@pytest.mark.parametrize("name", ["fib_gf97_2e2", "fib_stark101_2e6",
                                  "mimc3_2e5", "fibmul_2e5",
                                  "fibmul_gl_2e5"])
def test_stored_proofs_verify(vectors, name):
    pr = StarkProof.deserialize(json.dumps(vectors[name]).encode())
    assert verify(pr)


def test_regenerated_tiny_fib_is_byte_identical(vectors):
    cfg = ProverConfig(modulus=TEST_MODULUS, generator=5, log2_trace=2,
                       blowup=4, num_queries=2)
    pr = prove(cfg, a1=3)
    stored = StarkProof.deserialize(json.dumps(vectors["fib_gf97_2e2"]).encode())
    assert pr.proof == stored.proof


def test_regenerated_stark101_is_byte_identical(vectors):
    cfg = ProverConfig(log2_trace=6, blowup=8, num_queries=4)
    pr = prove(cfg, a1=3141592)
    stored = StarkProof.deserialize(
        json.dumps(vectors["fib_stark101_2e6"]).encode()
    )
    assert pr.proof == stored.proof


def test_regenerated_mimc_is_byte_identical(vectors):
    cfg = ProverConfig(log2_trace=5, blowup=4, num_queries=3)
    pr = prove(cfg, air=MimcAIR(x0=271828, k=777))
    stored = StarkProof.deserialize(json.dumps(vectors["mimc3_2e5"]).encode())
    assert pr.proof == stored.proof


def test_regenerated_fibmul_is_byte_identical(vectors):
    cfg = ProverConfig(log2_trace=5, blowup=4, num_queries=3)
    pr = prove(cfg, air=FibMulAIR(a0=1, b0=2718281))
    stored = StarkProof.deserialize(json.dumps(vectors["fibmul_2e5"]).encode())
    assert pr.proof == stored.proof


def test_regenerated_goldilocks_fibmul_is_byte_identical(vectors,
                                                         monkeypatch):
    """Multi-column x 64-bit field through the ONE-FETCH query path
    (VERDICT r2 missing-item 5): the spy asserts the single-fetch
    program ran — not the per-query host fallback — and the transcript
    matches the frozen vector byte for byte."""
    import stark_tpu.stark.prover as prov

    cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                       log2_trace=5, blowup=4, num_queries=3)
    pr = prove(cfg, air=FibMulAIR(a0=1, b0=2718281))
    assert prov.LAST_PROVE_PATH in ("mega", "single-fetch"), (
        "goldilocks fibmul fell back to the host query loop: "
        f"{prov.LAST_PROVE_PATH}")
    stored = StarkProof.deserialize(
        json.dumps(vectors["fibmul_gl_2e5"]).encode())
    assert pr.proof == stored.proof
