"""FRI tests: fold correctness vs the coefficient-domain oracle (the
reference's next_fri_polynomial semantics, fri_commit.rs:32-50),
end-to-end commit/decommit/verify round trips, and rejection of tampered
transcripts.  The reference's FRI never compiled (SURVEY §2.8) so these
vectors freeze the behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stark_tpu.channel import Channel, VerifierChannel, ChannelError
from stark_tpu.config import DEFAULT_MODULUS, TEST_MODULUS
from stark_tpu.fields import Fp
from stark_tpu.fri import (
    CosetFri,
    FRIVerificationError,
    decommit_fri,
    fri_commit,
    verify_fri,
)
from stark_tpu.fri.commit import _fold_jit, _inv_domain
from stark_tpu.ntt import coset_evaluate, root_of_unity
from stark_tpu.poly import Polynomial


def _codeword(p, log_deg_bound, blowup, offset, seed=0):
    """Random polynomial of degree < 2^log_deg_bound evaluated on a coset
    of size blowup * 2^log_deg_bound."""
    rng = np.random.default_rng(seed)
    deg = (1 << log_deg_bound) - 1
    coeffs = rng.integers(0, p, size=deg + 1, dtype=np.uint64).astype(np.uint32)
    n = blowup * (1 << log_deg_bound)
    evals = coset_evaluate(jnp.asarray(coeffs), p, n, offset)
    return coeffs, evals, n


class TestFold:
    def test_fold_matches_coefficient_oracle(self):
        """Evaluation-form fold == evaluate(even + beta*odd) on the folded
        domain (fri_commit.rs:32-65 semantics)."""
        p = TEST_MODULUS
        offset, beta = 3, 11
        coeffs, evals, n = _codeword(p, 3, 4, offset)  # deg<8 on 32 points
        folded = np.asarray(
            _fold_jit(p, n)(evals, jnp.uint32(beta), _inv_domain(p, n, offset))
        )
        poly = Polynomial(coeffs.tolist(), p)
        even = Polynomial(coeffs[0::2].tolist(), p)
        odd = Polynomial(coeffs[1::2].tolist(), p)
        target = even + odd * beta
        w = root_of_unity(p, n)
        for i in range(n // 2):
            x2 = pow(offset * pow(w, i, p) % p, 2, p)
            assert folded[i] == target.evaluate(x2).value, i

    def test_repeated_folds_reach_constant(self):
        p = DEFAULT_MODULUS
        coeffs, evals, n = _codeword(p, 6, 8, 5, seed=1)  # deg<64, n=512
        off = 5
        for k in range(6):
            m = int(evals.shape[0])
            evals = _fold_jit(p, m)(evals, jnp.uint32(7 + k), _inv_domain(p, m, off))
            off = off * off % p
        vals = np.asarray(evals)
        assert np.all(vals == vals[0])  # degree 0 after 6 folds

    def test_low_degree_is_required(self):
        # a full-degree (non-LDE) codeword does not fold to a constant
        p = TEST_MODULUS
        rng = np.random.default_rng(3)
        evals = jnp.asarray(
            rng.integers(0, p, size=16, dtype=np.uint64).astype(np.uint32)
        )
        ch = Channel(p)
        with pytest.raises(ValueError, match="constant"):
            fri_commit(evals, p, 1, ch, num_folds=2)


class TestEndToEnd:
    @pytest.mark.parametrize("p,log_deg,blowup", [
        (TEST_MODULUS, 2, 4),
        (DEFAULT_MODULUS, 6, 8),
    ])
    def test_commit_decommit_verify(self, p, log_deg, blowup):
        offset = 5
        _, evals, n = _codeword(p, log_deg, blowup, offset, seed=42)
        num_folds = log_deg  # fold to degree 0
        ch = Channel(p)
        proof = fri_commit(evals, p, offset, ch, num_folds=num_folds)
        decommit_fri(4, n - 1, proof.fri_layers, proof.fri_merkles, ch)
        assert verify_fri(ch.proof, p, n, offset, num_folds, 4, n - 1)

    def test_default_num_folds_stops_at_8(self):
        p = DEFAULT_MODULUS
        _, evals, n = _codeword(p, 6, 8, 5, seed=2)  # n = 512
        ch = Channel(p)
        proof = fri_commit(evals, p, 5, ch)  # default folds: log2(512)-3 = 6
        assert proof.fri_layers[-1].shape[0] == 8
        assert len(proof.fri_layers) == 7

    def test_proof_is_deterministic(self):
        p = DEFAULT_MODULUS
        _, evals, n = _codeword(p, 4, 4, 5, seed=9)

        def run():
            ch = Channel(p)
            pr = fri_commit(evals, p, 5, ch, num_folds=4)
            decommit_fri(2, n - 1, pr.fri_layers, pr.fri_merkles, ch)
            return [bytes(m) for m in ch.proof]

        assert run() == run()

    def test_transcript_structure(self):
        p = DEFAULT_MODULUS
        _, evals, n = _codeword(p, 4, 4, 5, seed=8)
        ch = Channel(p)
        fri_commit(evals, p, 5, ch, num_folds=4)
        # roots are 64 ASCII-hex bytes (root().to_vec() semantics,
        # fri_commit.rs:86); betas are 8-byte BE; final value 8-byte BE
        assert len(ch.proof[0]) == 64 and bytes.fromhex(ch.proof[0].decode())
        sizes = [len(m) for m in ch.proof]
        assert sizes == [64] + [8, 64] * 4 + [8]


class TestRejection:
    def _make(self, tamper=None):
        p = DEFAULT_MODULUS
        offset = 5
        _, evals, n = _codeword(p, 4, 4, offset, seed=5)
        ch = Channel(p)
        proof_obj = fri_commit(evals, p, offset, ch, num_folds=4)
        decommit_fri(2, n - 1, proof_obj.fri_layers, proof_obj.fri_merkles, ch)
        msgs = [bytes(m) for m in ch.proof]
        if tamper:
            tamper(msgs)
        return msgs, p, n, offset

    def test_honest_passes(self):
        msgs, p, n, off = self._make()
        assert verify_fri(msgs, p, n, off, 4, 2, n - 1)

    def test_tampered_root_rejected(self):
        def t(msgs):
            msgs[0] = b"0" * 64
        msgs, p, n, off = self._make(t)
        with pytest.raises((FRIVerificationError, ChannelError)):
            verify_fri(msgs, p, n, off, 4, 2, n - 1)

    def test_tampered_value_rejected(self):
        def t(msgs):
            # first opened value is right after: root,(beta,root)*4,final,idx
            i = 1 + 8 + 1 + 1
            msgs[i] = (int.from_bytes(msgs[i], "big") ^ 1).to_bytes(8, "big")
        msgs, p, n, off = self._make(t)
        with pytest.raises((FRIVerificationError, ChannelError)):
            verify_fri(msgs, p, n, off, 4, 2, n - 1)

    def test_tampered_final_value_rejected(self):
        def t(msgs):
            i = 1 + 8  # final constant position
            msgs[i] = (int.from_bytes(msgs[i], "big") ^ 1).to_bytes(8, "big")
        msgs, p, n, off = self._make(t)
        with pytest.raises((FRIVerificationError, ChannelError)):
            verify_fri(msgs, p, n, off, 4, 2, n - 1)

    def test_truncated_transcript_rejected(self):
        msgs, p, n, off = self._make()
        with pytest.raises((FRIVerificationError, ChannelError)):
            verify_fri(msgs[:-1], p, n, off, 4, 2, n - 1)


class TestCosetFri:
    def test_generate(self):
        p = TEST_MODULUS
        w = root_of_unity(p, 16)
        cf = CosetFri(p, 3, w, 16)
        dom = np.asarray(cf.generate_coset_domain())
        want = [3 * pow(w, i, p) % p for i in range(16)]
        assert dom.tolist() == want

    def test_next_halves_and_squares(self):
        p = TEST_MODULUS
        w = root_of_unity(p, 16)
        cf = CosetFri(p, 3, w, 16)
        dom = cf.generate_coset_domain()
        nxt = np.asarray(cf.next_coset_domain(dom))
        assert nxt.shape[0] == 8
        d = np.asarray(dom)
        assert nxt.tolist() == [int(d[i]) ** 2 % p for i in range(8)]

    def test_next_full_keeps_length(self):
        # reference's as-written non-halving variant (coset_fri.rs:40-50)
        p = TEST_MODULUS
        w = root_of_unity(p, 8)
        cf = CosetFri(p, 1, w, 8)
        dom = cf.generate_coset_domain()
        nxt = np.asarray(cf.next_coset_domain_full(dom))
        assert nxt.shape[0] == 8
