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


def test_resume_with_mesh_matches():
    """Checkpoint/resume composes with the sharded prover."""
    import jax

    from stark_tpu.dist import make_mesh

    mesh = make_mesh(4, devices=jax.local_devices(backend="cpu")[:4])
    ckpt = prove_resumable(CFG, stop_after="fri-commit", mesh=mesh)
    resumed = prove_resumable(CFG, resume=ckpt, mesh=mesh)
    assert resumed.proof == prove(CFG).proof
    assert verify(resumed)
