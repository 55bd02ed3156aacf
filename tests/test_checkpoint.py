"""Checkpoint / resume / fault-injection tests (SURVEY §5.3-5.4): crash
the prover at every phase boundary, resume from the serialized
checkpoint, and require the final proof to be byte-identical; corrupt the
checkpoint and require divergence detection."""

import pytest

from stark_tpu.config import ProverConfig
from stark_tpu.stark import prove, verify
from stark_tpu.stark.checkpoint import (
    ProverCheckpoint,
    ResumeMismatch,
    prove_resumable,
)

CFG = ProverConfig(log2_trace=6, blowup=4, num_queries=3)


@pytest.fixture(scope="module")
def full_proof():
    return prove(CFG)


@pytest.mark.parametrize("phase", ["trace-commit", "composition", "fri-commit"])
def test_crash_and_resume_is_byte_identical(phase, full_proof):
    ckpt = prove_resumable(CFG, stop_after=phase)
    assert isinstance(ckpt, ProverCheckpoint)
    assert ckpt.phase == phase
    assert 0 < len(ckpt.proof) < len(full_proof.proof)
    # serialize across the "restart"
    restored = ProverCheckpoint.deserialize(ckpt.serialize())
    resumed = prove_resumable(CFG, resume=restored)
    assert resumed.proof == full_proof.proof
    assert verify(resumed)


def test_no_stop_equals_plain_prove(full_proof):
    assert prove_resumable(CFG).proof == full_proof.proof


def test_corrupted_checkpoint_detected():
    ckpt = prove_resumable(CFG, stop_after="fri-commit")
    bad = ProverCheckpoint.deserialize(ckpt.serialize())
    m = bytearray(bad.proof[2])
    m[-1] ^= 1
    bad.proof[2] = bytes(m)
    with pytest.raises(ResumeMismatch):
        prove_resumable(CFG, resume=bad)


def test_checkpoint_config_mismatch_rejected():
    ckpt = prove_resumable(CFG, stop_after="trace-commit")
    other = ProverConfig(log2_trace=6, blowup=4, num_queries=4)
    with pytest.raises(ValueError):
        prove_resumable(other, resume=ckpt)
    with pytest.raises(ValueError):
        prove_resumable(CFG, a1=999, resume=ckpt)


class TestEveryFamilyResumes:
    """One crash+resume per family CLASS (VERDICT r3 item 6): legacy
    hand-written AIR, declarative spec, multi-column, Goldilocks field.
    In each, resume omits air= — the checkpoint rebuilds its own AIR."""

    def _roundtrip(self, cfg, air):
        full = prove(cfg, air=air)
        ckpt = prove_resumable(cfg, air=air, stop_after="fri-commit")
        assert isinstance(ckpt, ProverCheckpoint)
        restored = ProverCheckpoint.deserialize(ckpt.serialize())
        resumed = prove_resumable(cfg, resume=restored)
        assert resumed.proof == full.proof
        assert verify(resumed)

    def test_legacy_mimc(self):
        from stark_tpu.stark import MimcAIR

        self._roundtrip(CFG, MimcAIR(x0=424242))

    def test_multi_column_fibmul(self):
        from stark_tpu.stark import FibMulAIR

        self._roundtrip(CFG, FibMulAIR(b0=777777))

    def test_declarative_spec(self):
        from stark_tpu.stark.families import MIMC5

        cfg = ProverConfig(log2_trace=6, blowup=8, num_queries=3)
        self._roundtrip(cfg, MIMC5(x0=161803))

    def test_goldilocks(self):
        cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                           log2_trace=6, blowup=4, num_queries=3)
        full = prove(cfg)
        ckpt = prove_resumable(cfg, stop_after="fri-commit")
        restored = ProverCheckpoint.deserialize(ckpt.serialize())
        resumed = prove_resumable(cfg, resume=restored)
        assert resumed.proof == full.proof
        assert verify(resumed)

    def test_witness_mismatch_rejected(self):
        from stark_tpu.stark import MimcAIR

        ckpt = prove_resumable(CFG, air=MimcAIR(x0=1), stop_after="fri-commit")
        with pytest.raises(ValueError, match="statement/witness"):
            prove_resumable(CFG, air=MimcAIR(x0=2), resume=ckpt)


def test_resume_with_mesh_matches():
    """Checkpoint/resume composes with the sharded prover."""
    import jax

    from stark_tpu.dist import make_mesh

    mesh = make_mesh(4, devices=jax.local_devices(backend="cpu")[:4])
    ckpt = prove_resumable(CFG, stop_after="fri-commit", mesh=mesh)
    resumed = prove_resumable(CFG, resume=ckpt, mesh=mesh)
    assert resumed.proof == prove(CFG).proof
    assert verify(resumed)
