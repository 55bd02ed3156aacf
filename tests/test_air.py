"""AIR abstraction tests: the MiMC cube-chain family end-to-end (its
degree-3 transition exercises the extra FRI fold and 2-shift openings),
plus AIR registry/serialization and cross-AIR soundness.
"""

import numpy as np
import pytest

from stark_tpu.config import DEFAULT_MODULUS, ProverConfig
from stark_tpu.stark import (
    FibonacciSquareAIR,
    MimcAIR,
    StarkProof,
    StarkVerificationError,
    air_from_name,
    prove,
    verify,
)

P = DEFAULT_MODULUS
CFG = ProverConfig(log2_trace=6, blowup=4, num_queries=4)


class TestMimcTrace:
    def test_recurrence(self):
        air = MimcAIR(x0=5, k=3)
        tr = np.asarray(air.build_trace(ProverConfig(log2_trace=4, blowup=4)))
        want = [5]
        for _ in range(14):
            want.append(pow((want[-1] + 3) % P, 3, P))
        assert tr.tolist() == want

    def test_publics(self):
        air = MimcAIR(x0=5, k=3)
        tr = air.build_trace(ProverConfig(log2_trace=4, blowup=4))
        pub = air.publics(tr)
        assert pub["input"] == 5 and pub["k"] == 3
        assert pub["output"] == int(np.asarray(tr[-1:])[0])


class TestMimcProveVerify:
    def test_roundtrip(self):
        air = MimcAIR(x0=271828, k=777)
        pr = prove(CFG, air=air)
        assert pr.air_name == "mimc3"
        assert pr.extra_publics == {"k": 777}
        assert verify(pr)

    def test_extra_fold_count(self):
        """MiMC CP has degree < 2N: one more FRI root/beta pair than fib."""
        fib = prove(CFG)
        mimc = prove(CFG, air=MimcAIR())
        # transcript: root + num_folds*(beta, root) + final + ...
        # count 64-byte hex-root messages in the commit phase
        def roots(p):
            n = 0
            for m in p.proof:
                if len(m) == 64:
                    try:
                        bytes.fromhex(m.decode())
                        n += 1
                    except (ValueError, UnicodeDecodeError):
                        break
            return n
        assert roots(mimc) == roots(fib) + 1

    def test_serialize_roundtrip(self):
        pr = prove(CFG, air=MimcAIR(x0=42, k=9))
        back = StarkProof.deserialize(pr.serialize())
        assert back.air_name == "mimc3"
        assert back.publics == pr.publics
        assert verify(back)

    def test_blowup_2_rejected(self):
        with pytest.raises(ValueError, match="blowup"):
            prove(ProverConfig(log2_trace=6, blowup=2, num_queries=2),
                  air=MimcAIR())

    def test_deterministic(self):
        a = prove(CFG, air=MimcAIR(x0=1, k=2))
        b = prove(CFG, air=MimcAIR(x0=1, k=2))
        assert a.proof == b.proof


class TestMimcSoundness:
    def test_tampering_rejected(self):
        pr = prove(CFG, air=MimcAIR())
        for i in [0, 1, 5, len(pr.proof) // 2, len(pr.proof) - 1]:
            msgs = [bytes(m) for m in pr.proof]
            bb = bytearray(msgs[i])
            bb[-1] ^= 1
            msgs[i] = bytes(bb)
            bad = StarkProof(msgs, pr.a0, pr.a_last, pr.config,
                             pr.air_name, pr.extra_publics)
            with pytest.raises(StarkVerificationError):
                verify(bad)

    def test_wrong_output_rejected(self):
        pr = prove(CFG, air=MimcAIR())
        bad = StarkProof(pr.proof, pr.a0, (pr.a_last + 1) % P, pr.config,
                         pr.air_name, pr.extra_publics)
        with pytest.raises(StarkVerificationError):
            verify(bad)

    def test_wrong_key_rejected(self):
        pr = prove(CFG, air=MimcAIR(k=777))
        bad = StarkProof(pr.proof, pr.a0, pr.a_last, pr.config,
                         pr.air_name, {"k": 778})
        with pytest.raises(StarkVerificationError):
            verify(bad)

    def test_air_confusion_rejected(self):
        """A fib proof presented as a mimc proof must not verify."""
        pr = prove(CFG)
        bad = StarkProof(pr.proof, pr.a0, pr.a_last, pr.config,
                         "mimc3", {"k": 0})
        with pytest.raises(StarkVerificationError):
            verify(bad)


class TestRegistry:
    def test_air_from_name(self):
        assert isinstance(air_from_name("fibonacci-square", {"a0": 1}),
                          FibonacciSquareAIR)
        m = air_from_name("mimc3", {"input": 7, "k": 9})
        assert isinstance(m, MimcAIR) and m.k == 9
        with pytest.raises(ValueError):
            air_from_name("nope", {})
