"""Single-dispatch ("mega") prove: the whole post-LDE pipeline traced
into one program (stark/prover._prove_mega).  Transcripts must be
byte-identical to the multi-launch single-fetch path for every family,
and the path selection must respect its gates."""

import os

import pytest

import stark_tpu.stark.prover as pm
from stark_tpu import ProverConfig
from stark_tpu.stark import prove, verify


def _pair(cfg, air=None, monkeypatch=None):
    monkeypatch.setenv("STARK_TPU_NO_MEGA", "1")
    a = prove(cfg, air=air)
    assert pm.LAST_PROVE_PATH == "single-fetch"
    monkeypatch.delenv("STARK_TPU_NO_MEGA")
    # mega is TPU-only by default (its payoff is tunnel launch latency);
    # force it on the CPU test backend to pin byte-identity
    monkeypatch.setenv("STARK_TPU_FORCE_MEGA", "1")
    b = prove(cfg, air=air)
    monkeypatch.delenv("STARK_TPU_FORCE_MEGA")
    assert pm.LAST_PROVE_PATH == "mega"
    return a, b


def test_mega_byte_identical_fib(monkeypatch):
    cfg = ProverConfig(log2_trace=8, blowup=4, num_queries=6)
    a, b = _pair(cfg, monkeypatch=monkeypatch)
    assert a.proof == b.proof
    assert verify(b)


def test_mega_byte_identical_multi_column(monkeypatch):
    from stark_tpu.stark.air import FibMulAIR

    cfg = ProverConfig(log2_trace=8, blowup=4, num_queries=4)
    a, b = _pair(cfg, air=FibMulAIR(), monkeypatch=monkeypatch)
    assert a.proof == b.proof
    assert verify(b)


def test_mega_byte_identical_goldilocks(monkeypatch):
    # log2_trace=6: the wide-field mega program is the heaviest CPU
    # compile in the suite — the smallest config still pins every
    # transcript-critical path
    cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                       log2_trace=6, blowup=4, num_queries=4)
    a, b = _pair(cfg, monkeypatch=monkeypatch)
    assert a.proof == b.proof
    assert verify(b)


def test_mega_respects_size_gate(monkeypatch):
    monkeypatch.setenv("STARK_TPU_FORCE_MEGA", "1")
    monkeypatch.setenv("STARK_TPU_MEGA_MAX", "16")  # below any real M
    cfg = ProverConfig(log2_trace=8, blowup=4, num_queries=4)
    prove(cfg)
    assert pm.LAST_PROVE_PATH == "single-fetch"


def test_mega_skipped_for_precise_metrics():
    from stark_tpu.utils.metrics import MetricsCollector

    cfg = ProverConfig(log2_trace=8, blowup=4, num_queries=4)
    mx = MetricsCollector()
    pf = prove(cfg, metrics=mx)
    # precise metrics need per-phase dispatch boundaries
    assert pm.LAST_PROVE_PATH == "single-fetch"
    names = [ph["name"] for ph in mx.to_dict()["phases"]]
    assert "fri-commit" in names and "queries" in names
    assert verify(pf)
