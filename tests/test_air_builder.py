"""Declarative AIR builder (stark_tpu/stark/air_builder.py).

The strongest oracle: re-deriving each hand-written family (Fibonacci-
square, MiMC, FibMul) declaratively must produce BYTE-IDENTICAL proof
transcripts — same trace, same root, same challenge draws, same
openings.  Then a brand-new 3-column family defined only declaratively
proves and verifies end-to-end (including through the registry and on
the Goldilocks field), and the degree inference matches the hand-
computed fold counts.
"""

import pytest

from stark_tpu.config import ProverConfig
from stark_tpu.stark import (
    AirSpec,
    Boundary,
    FibMulAIR,
    FibonacciSquareAIR,
    MimcAIR,
    StarkVerificationError,
    prove,
    verify,
)

GOLDILOCKS = 2**64 - 2**32 + 1


# ---------------------------------------------------------------------------
# Declarative re-derivations of the hand-written families
# ---------------------------------------------------------------------------
FIB_DECL = AirSpec(
    name="fib-decl",
    columns=1,
    init=((("a0", 1),), (("a1", 3141592),)),  # window of 2 rows
    step=lambda f, rows, P: (
        f.add(f.mul(rows[1][0], rows[1][0]), f.mul(rows[0][0], rows[0][0])),
    ),
    boundaries=(
        Boundary(column=0, row=0, public="input"),
        Boundary(column=0, row=-1, public="output"),
    ),
)

MIMC_DECL = AirSpec(
    name="mimc-decl",
    columns=1,
    init=((("x0", 271828),),),
    step=lambda f, rows, P: (
        (lambda t: f.mul(f.mul(t, t), t))(f.add(rows[0][0], P["k"])),
    ),
    boundaries=(
        Boundary(column=0, row=0, public="input"),
        Boundary(column=0, row=-1, public="output"),
    ),
    params={"k": 777},
)

FIBMUL_DECL = AirSpec(
    name="fibmul-decl",
    columns=2,
    init=((("a0", 1), ("b0", 2718281)),),
    step=lambda f, rows, P: (rows[0][1], f.mul(rows[0][0], rows[0][1])),
    boundaries=(
        Boundary(column=0, row=0, public="input"),
        Boundary(column=1, row=0, public="b0"),
        Boundary(column=1, row=-1, public="output"),
    ),
)

# A brand-new family that exists ONLY declaratively: 3-column
# "tribonacci-mul"  a' = b, b' = c, c' = a*b + c  (degree-2 transition),
# shipped in stark_tpu.stark.families.
from stark_tpu.stark.families import MIMC5, TRIBMUL  # noqa: E402


class TestByteIdentity:
    """Declarative spec == hand-written AIR, transcript-for-transcript."""

    CFG = ProverConfig(log2_trace=5, blowup=4, num_queries=4)

    def test_fibonacci_square(self):
        hand = prove(self.CFG, air=FibonacciSquareAIR(a1=3141592))
        decl = prove(self.CFG, air=FIB_DECL())
        assert decl.proof == hand.proof
        assert decl.a0 == hand.a0 and decl.a_last == hand.a_last

    def test_mimc(self):
        hand = prove(self.CFG, air=MimcAIR(x0=271828, k=777))
        decl = prove(self.CFG, air=MIMC_DECL())
        assert decl.proof == hand.proof

    def test_fibmul(self):
        hand = prove(self.CFG, air=FibMulAIR(a0=1, b0=2718281))
        decl = prove(self.CFG, air=FIBMUL_DECL())
        assert decl.proof == hand.proof

    def test_explicit_transitions_match_auto(self):
        explicit = AirSpec(
            name="fibmul-explicit",
            columns=2,
            init=((("a0", 1), ("b0", 2718281)),),
            step=lambda f, rows, P: (rows[0][1], f.mul(rows[0][0], rows[0][1])),
            boundaries=FIBMUL_DECL.boundaries,
            transitions=lambda f, rows, P: (
                f.sub(rows[1][0], rows[0][1]),
                f.sub(rows[1][1], f.mul(rows[0][0], rows[0][1])),
            ),
            register=False,
        )
        a = prove(self.CFG, air=FIBMUL_DECL())
        b = prove(self.CFG, air=explicit())
        assert a.proof == b.proof


class TestDegreeInference:
    CFG = ProverConfig(log2_trace=6, blowup=4, num_queries=4)

    def test_matches_hand_written(self):
        assert FIB_DECL.num_folds(self.CFG) == FibonacciSquareAIR().num_folds(
            self.CFG
        )
        assert MIMC_DECL.num_folds(self.CFG) == MimcAIR().num_folds(self.CFG)
        assert FIBMUL_DECL.num_folds(self.CFG) == FibMulAIR().num_folds(
            self.CFG
        )

    def test_alpha_counts(self):
        assert FIB_DECL.num_alphas == FibonacciSquareAIR.num_alphas == 3
        assert MIMC_DECL.num_alphas == MimcAIR.num_alphas == 3
        assert FIBMUL_DECL.num_alphas == FibMulAIR.num_alphas == 5

    def test_degree5_needs_more_folds_and_blowup(self):
        quintic = AirSpec(
            name="mimc5-test",
            columns=1,
            init=((("x0", 7),),),
            step=lambda f, rows, P: (
                (lambda t, t2: f.mul(f.mul(t2, t2), t))(
                    f.add(rows[0][0], P["k"]),
                    f.mul(f.add(rows[0][0], P["k"]), f.add(rows[0][0], P["k"])),
                ),
            ),
            boundaries=(
                Boundary(column=0, row=0, public="input"),
                Boundary(column=0, row=-1, public="output"),
            ),
            params={"k": 5},
            register=False,
        )
        # degree-5 transition: quotient deg 5(T-1) - (T-1) = 4T-4 < 4N
        assert quintic.num_folds(self.CFG) == self.CFG.log2_trace + 2
        with pytest.raises(ValueError, match="blowup"):
            quintic.validate(self.CFG)  # blowup 4 < required 8
        quintic.validate(
            ProverConfig(log2_trace=6, blowup=8, num_queries=4)
        )


class TestNewFamily:
    CFG = ProverConfig(log2_trace=5, blowup=4, num_queries=4)

    def test_prove_verify_roundtrip(self):
        proof = prove(self.CFG, air=TRIBMUL())
        # verify reconstructs the spec through the registry (air=None)
        assert verify(proof)
        assert proof.air_name == "tribmul"
        assert set(proof.publics) == {"input", "output", "b0", "c0"}

    def test_witness_binding_changes_output(self):
        p1 = prove(self.CFG, air=TRIBMUL())
        p2 = prove(self.CFG, air=TRIBMUL(b0=99))
        assert p1.publics["output"] != p2.publics["output"]
        assert verify(p2)

    def test_tamper_rejected(self):
        import copy

        proof = prove(self.CFG, air=TRIBMUL())
        for msg_i in (0, 3, len(proof.proof) - 1):
            bad = copy.deepcopy(proof)
            m = bytearray(bad.proof[msg_i])
            m[0] ^= 1
            bad.proof[msg_i] = bytes(m)
            with pytest.raises(StarkVerificationError):
                verify(bad)

    def test_cheating_witness_rejected(self):
        import copy

        proof = prove(self.CFG, air=TRIBMUL())
        bad = copy.deepcopy(proof)
        bad.extra_publics = dict(bad.extra_publics or {})
        bad.a_last = (bad.a_last + 1) % self.CFG.modulus
        with pytest.raises(StarkVerificationError):
            verify(bad)

    def test_goldilocks_custom_air(self):
        cfg = ProverConfig(
            modulus=GOLDILOCKS, generator=7, log2_trace=6, blowup=4,
            num_queries=4,
        )
        proof = prove(cfg, air=MIMC_DECL(x0=987654321987654321))
        assert verify(proof)
        assert proof.publics["input"] == 987654321987654321

    def test_serialize_roundtrip_verifies(self):
        from stark_tpu.stark import StarkProof

        proof = prove(self.CFG, air=TRIBMUL())
        again = StarkProof.deserialize(proof.serialize())
        assert verify(again)

    def test_mimc5_degree5_family(self):
        cfg = ProverConfig(log2_trace=5, blowup=8, num_queries=4)
        proof = prove(cfg, air=MIMC5(x0=31337))
        assert verify(proof)
        # the inferred degree rejects blowup 4
        with pytest.raises(ValueError, match="blowup"):
            MIMC5().validate(
                ProverConfig(log2_trace=5, blowup=4, num_queries=4)
            )

    def test_cli_roundtrip_tribmul(self, tmp_path):
        from stark_tpu.cli import main as cli_main

        out = tmp_path / "p.json"
        rc = cli_main([
            "prove", "--air", "tribmul", "--log2-trace", "5",
            "--blowup", "4", "--num-queries", "4", "--secret", "7",
            "--cpu", "-o", str(out),
        ])
        assert rc == 0
        assert cli_main(["verify", str(out), "--cpu"]) == 0


class TestBatchedSpecs:
    CFG = ProverConfig(log2_trace=5, blowup=4, num_queries=4)

    def test_batch_matches_sequential(self):
        from stark_tpu.stark import prove_batch

        airs = [MIMC_DECL(x0=s) for s in (11, 22, 33)]
        batched = prove_batch(self.CFG, airs)
        for air, bp in zip(airs, batched):
            assert bp.proof == prove(self.CFG, air=air).proof
            assert verify(bp)

    def test_batch_rejects_mixed_params(self):
        from stark_tpu.stark import prove_batch

        with pytest.raises(ValueError, match="one family"):
            prove_batch(self.CFG, [MIMC_DECL(k=1), MIMC_DECL(k=2)])

    def test_batch_rejects_multicolumn(self):
        from stark_tpu.stark import prove_batch

        with pytest.raises(ValueError, match="single-column"):
            prove_batch(self.CFG, [TRIBMUL(), TRIBMUL()])


class TestSpecValidation:
    def test_missing_input_public(self):
        with pytest.raises(ValueError, match="input"):
            AirSpec(
                name="bad1", columns=1, init=(((("x0", 1)),),),
                step=lambda f, rows, P: (rows[0][0],),
                boundaries=(Boundary(0, -1, "output"),),
                register=False,
            )

    def test_bad_shifts(self):
        with pytest.raises(ValueError, match="shifts"):
            AirSpec(
                name="bad2", columns=1, init=((("x0", 1),),),
                step=lambda f, rows, P: (rows[0][0],),
                boundaries=(
                    Boundary(0, 0, "input"), Boundary(0, -1, "output"),
                ),
                shifts=(1, 2),
                register=False,
            )

    def test_unknown_witness_binding(self):
        with pytest.raises(ValueError, match="unknown"):
            TRIBMUL(nope=1)

    def test_multicolumn_goldilocks_rejected(self):
        cfg = ProverConfig(
            modulus=GOLDILOCKS, generator=7, log2_trace=6, blowup=4,
            num_queries=4,
        )
        with pytest.raises(ValueError, match="multi-column"):
            TRIBMUL().validate(cfg)

    def test_param_public_collision(self):
        with pytest.raises(ValueError, match="double-bound"):
            AirSpec(
                name="bad3", columns=1, init=((("x0", 1),),),
                step=lambda f, rows, P: (rows[0][0],),
                boundaries=(
                    Boundary(0, 0, "input"), Boundary(0, -1, "output"),
                ),
                params={"input": 3},
                register=False,
            )
