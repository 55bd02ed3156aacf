"""Batched proving tests: transcripts must equal sequential prove() calls
byte-for-byte (batching is pure throughput, zero semantic drift)."""

import pytest

from stark_tpu.config import ProverConfig
from stark_tpu.stark import FibonacciSquareAIR, MimcAIR, prove, verify
from stark_tpu.stark.batch import prove_batch

CFG = ProverConfig(log2_trace=6, blowup=4, num_queries=3)


def test_fib_batch_matches_sequential():
    secrets = [3141592, 2718281, 1414213]
    batch = prove_batch(CFG, [FibonacciSquareAIR(a1=s) for s in secrets])
    assert len(batch) == 3
    for s, pr in zip(secrets, batch):
        solo = prove(CFG, a1=s)
        assert pr.proof == solo.proof
        assert verify(pr)


def test_mimc_batch_matches_sequential():
    xs = [11, 22]
    batch = prove_batch(CFG, [MimcAIR(x0=x, k=9) for x in xs])
    for x, pr in zip(xs, batch):
        solo = prove(CFG, air=MimcAIR(x0=x, k=9))
        assert pr.proof == solo.proof
        assert verify(pr)


def test_fibmul_batch_matches_sequential():
    """Multi-column (C=2) batch: the round-3 verdict's item 6 — batch was
    single-column only (old batch.py:182-183)."""
    from stark_tpu.stark import FibMulAIR

    bs = [2718281, 1234567]
    batch = prove_batch(CFG, [FibMulAIR(b0=b) for b in bs])
    for b, pr in zip(bs, batch):
        solo = prove(CFG, air=FibMulAIR(b0=b))
        assert pr.proof == solo.proof
        assert verify(pr)


def test_tribmul_spec_batch_matches_sequential():
    """Three-column declarative spec through the same batched pipeline."""
    from stark_tpu.stark.families import TRIBMUL

    bs = [2, 5]
    batch = prove_batch(CFG, [TRIBMUL(b0=b) for b in bs])
    for b, pr in zip(bs, batch):
        solo = prove(CFG, air=TRIBMUL(b0=b))
        assert pr.proof == solo.proof
        assert verify(pr)


def test_empty_batch():
    assert prove_batch(CFG, []) == []


def test_mixed_families_rejected():
    with pytest.raises(ValueError):
        prove_batch(CFG, [FibonacciSquareAIR(), MimcAIR()])


def test_mixed_mimc_keys_rejected():
    with pytest.raises(ValueError):
        prove_batch(CFG, [MimcAIR(k=1), MimcAIR(k=2)])


def test_goldilocks_batch_matches_sequential():
    """Wide-field (64-bit Goldilocks) batch — the r4 verdict's item 6:
    prove_batch raised for width != 1 (old batch.py:201-204).  The limb
    plane leads and the batch rides the middle axis; transcripts must
    still equal sequential proves byte-for-byte."""
    g_cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                         log2_trace=6, blowup=4, num_queries=3)
    secrets = [3141592, 2718281, 99]
    batch = prove_batch(g_cfg, [FibonacciSquareAIR(a1=s) for s in secrets])
    assert len(batch) == 3
    for s, pr in zip(secrets, batch):
        solo = prove(g_cfg, a1=s)
        assert pr.proof == solo.proof
        assert verify(pr)


def test_goldilocks_mimc_batch_matches_sequential():
    g_cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                         log2_trace=6, blowup=4, num_queries=3)
    xs = [10**15 + 7, 2**63 - 1]
    batch = prove_batch(g_cfg, [MimcAIR(x0=x, k=9) for x in xs])
    for x, pr in zip(xs, batch):
        solo = prove(g_cfg, air=MimcAIR(x0=x, k=9))
        assert pr.proof == solo.proof
        assert verify(pr)


def test_wide_multicolumn_batch_rejected():
    from stark_tpu.stark import FibMulAIR

    g_cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                         log2_trace=6, blowup=4, num_queries=3)
    with pytest.raises(ValueError, match="single-column"):
        prove_batch(g_cfg, [FibMulAIR(b0=1), FibMulAIR(b0=2)])
