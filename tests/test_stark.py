"""End-to-end STARK tests — the minimum end-to-end slice of SURVEY §7.2.7
(BASELINE config #1: full prove at 2^10 rows, CPU-runnable), plus
soundness probes (tampering every phase of the transcript must fail).
"""

import numpy as np
import pytest

from stark_tpu.config import DEFAULT_MODULUS, ProverConfig
from stark_tpu.stark import (
    StarkProof,
    StarkVerificationError,
    fibonacci_square_trace,
    prove,
    trace_polynomial,
    verify,
)
from stark_tpu.ntt.reference_ntt import root_of_unity
from stark_tpu.poly import Polynomial

SMALL = ProverConfig(log2_trace=6, blowup=4, num_queries=4)


@pytest.fixture(scope="module")
def small_proof():
    return prove(SMALL)


class TestTrace:
    def test_fibonacci_square_values(self):
        p = DEFAULT_MODULUS
        tr = np.asarray(fibonacci_square_trace(p, 8, 1, 2))
        want = [1, 2]
        for _ in range(6):
            want.append((want[-1] ** 2 + want[-2] ** 2) % p)
        assert tr.tolist() == want

    def test_stark101_anchor(self):
        """a_1 = 3141592 must give a_1022 = 2338775057 (STARK-101's
        public boundary constant)."""
        p = DEFAULT_MODULUS
        tr = fibonacci_square_trace(p, 1023, 1, 3141592)
        assert int(np.asarray(tr[-1:])[0]) == 2338775057

    def test_trace_polynomial_interpolates(self):
        p = DEFAULT_MODULUS
        k = 4
        n = 1 << k
        tr = fibonacci_square_trace(p, n - 1, 1, 7)
        coeffs = np.asarray(trace_polynomial(tr, p))
        assert coeffs[-1] == 0  # degree <= n-2 (STARK-101's interpolant)
        g = root_of_unity(p, n)
        f = Polynomial(coeffs.tolist(), p)
        trh = np.asarray(tr)
        for i in range(n - 1):
            assert f.evaluate(pow(g, i, p)).value == int(trh[i]), i


class TestProveVerify:
    def test_small_roundtrip(self, small_proof):
        assert verify(small_proof)

    def test_full_2e10_prove(self):
        """BASELINE config #1: 2^10 rows, blowup 8 — the STARK-101 shape."""
        cfg = ProverConfig(log2_trace=10, blowup=8, num_queries=4)
        pr = prove(cfg)
        assert pr.a_last == 2338775057
        assert verify(pr)

    def test_deterministic(self):
        a = prove(SMALL)
        b = prove(SMALL)
        assert a.proof == b.proof

    def test_different_secret_different_proof(self):
        a = prove(SMALL, a1=3141592)
        b = prove(SMALL, a1=2718281)
        assert a.proof != b.proof
        assert verify(b)

    def test_serialize_roundtrip(self, small_proof):
        back = StarkProof.deserialize(small_proof.serialize())
        assert back.proof == small_proof.proof
        assert back.config == small_proof.config
        assert verify(back)


class TestSoundness:
    def _tampered(self, src: StarkProof, i: int, proof=None) -> StarkProof:
        msgs = [bytes(m) for m in (proof or src.proof)]
        if i < len(msgs) and msgs[i]:
            b = bytearray(msgs[i])
            b[-1] ^= 1
            msgs[i] = bytes(b)
        return StarkProof(msgs, src.a0, src.a_last, src.config)

    def test_tamper_every_message_rejected(self, small_proof):
        """Flipping one bit anywhere in the transcript must fail."""
        n = len(small_proof.proof)
        # exhaustive over the commit phase, sampled over the query phase
        positions = list(range(0, 12)) + list(range(12, n, max(1, n // 24)))
        for i in positions:
            with pytest.raises(StarkVerificationError):
                verify(self._tampered(small_proof, i))

    def test_wrong_public_output_rejected(self, small_proof):
        bad = StarkProof(
            small_proof.proof, small_proof.a0, small_proof.a_last + 1,
            small_proof.config,
        )
        with pytest.raises(StarkVerificationError):
            verify(bad)

    def test_truncated_rejected(self, small_proof):
        bad = StarkProof(
            small_proof.proof[:-1], small_proof.a0, small_proof.a_last,
            small_proof.config,
        )
        with pytest.raises(StarkVerificationError):
            verify(bad)

    def test_extended_rejected(self, small_proof):
        bad = StarkProof(
            list(small_proof.proof) + [b"extra"], small_proof.a0,
            small_proof.a_last, small_proof.config,
        )
        with pytest.raises(StarkVerificationError):
            verify(bad)

    def test_cheating_trace_rejected(self):
        """A trace violating the AIR at one row must not verify against
        the honest public output."""
        p = DEFAULT_MODULUS
        honest = prove(SMALL)
        tr = np.asarray(fibonacci_square_trace(p, SMALL.trace_length, 1, 3141592))
        tr = tr.copy()
        tr[10] = (tr[10] + 1) % p  # break the recurrence mid-trace
        import jax.numpy as jnp

        cheat = prove(SMALL, trace=jnp.asarray(tr), strict=False)
        # same claimed output, broken middle: must fail verification
        cheat_claim = StarkProof(cheat.proof, cheat.a0, cheat.a_last, SMALL)
        with pytest.raises(StarkVerificationError):
            verify(cheat_claim)
        assert verify(honest)
