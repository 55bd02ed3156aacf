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

    def test_batch_rejects_wide_multicolumn(self):
        # wide-field batching landed in r5 (tests/test_batch.py has the
        # positive single-column Goldilocks cases); the remaining
        # envelope limit is wide AND multi-column together
        from stark_tpu.config import ProverConfig
        from stark_tpu.stark import prove_batch

        g_cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                             log2_trace=6, blowup=4, num_queries=3)
        with pytest.raises(ValueError, match="single-column"):
            prove_batch(g_cfg, [TRIBMUL(), TRIBMUL()])


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

    def test_multicolumn_goldilocks_accepted(self):
        """Round 3 lifted the multi-column x 64-bit restriction; the
        end-to-end roundtrip lives in test_device_query
        (test_tribmul_goldilocks_roundtrip)."""
        cfg = ProverConfig(
            modulus=GOLDILOCKS, generator=7, log2_trace=6, blowup=4,
            num_queries=4,
        )
        TRIBMUL().validate(cfg)  # must not raise

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

class TestPeriodicColumns:
    """Round-constant schedules as periodic columns: device interpolant,
    trace xs, and verifier Horner mirror must all agree."""

    CFG = ProverConfig(log2_trace=5, blowup=8, num_queries=4)

    @staticmethod
    def _host_rows(x, rc, T, p):
        rows = [x]
        for t in range(T - 1):
            x = pow((x + rc[t % len(rc)]) % p, 5, p)
            rows.append(x)
        return rows

    def test_trace_matches_host_mirror(self):
        from stark_tpu.stark.families import MIMC5RC

        import numpy as np

        cfg = self.CFG
        tr = np.asarray(MIMC5RC.build_trace(cfg)).tolist()
        assert tr == self._host_rows(
            314159, MIMC5RC.periodic["rc"], cfg.trace_length, cfg.modulus
        )

    def test_prove_verify_roundtrip(self):
        from stark_tpu.stark.families import MIMC5RC

        proof = prove(self.CFG, air=MIMC5RC(x0=777))
        assert verify(proof)
        exp = self._host_rows(
            777, MIMC5RC.periodic["rc"], self.CFG.trace_length,
            self.CFG.modulus,
        )[-1]
        assert proof.publics["output"] == exp
        # schedule values are part of the spec, not the publics
        assert "rc" not in proof.publics

    def test_tamper_rejected(self):
        import copy

        from stark_tpu.stark.families import MIMC5RC

        proof = prove(self.CFG, air=MIMC5RC())
        for msg_i in (0, 2, len(proof.proof) - 1):
            bad = copy.deepcopy(proof)
            m = bytearray(bad.proof[msg_i])
            m[0] ^= 1
            bad.proof[msg_i] = bytes(m)
            with pytest.raises(StarkVerificationError):
                verify(bad)

    def test_schedule_differs_from_fixed_constant(self):
        """A real schedule must not collapse to the fixed-k family."""
        from stark_tpu.stark.families import MIMC5, MIMC5RC

        p1 = prove(self.CFG, air=MIMC5(x0=314159))
        p2 = prove(self.CFG, air=MIMC5RC(x0=314159))
        assert p1.publics["output"] != p2.publics["output"]

    def test_length_one_cycle_equals_param(self):
        """L=1 periodic == fixed param: identical traces (the interpolant
        is the constant polynomial)."""
        import numpy as np

        const_spec = AirSpec(
            name="mimc5-const-k", columns=1, init=((("x0", 5),),),
            step=lambda f, rows, P: (
                (lambda t: f.mul(f.mul(f.mul(f.mul(t, t), t), t), t))(
                    f.add(rows[0][0], P["rc"])),
            ),
            boundaries=(Boundary(0, 0, "input"), Boundary(0, -1, "output")),
            periodic={"rc": (777,)},
            register=False,
        )
        param_spec = AirSpec(
            name="mimc5-param-k", columns=1, init=((("x0", 5),),),
            step=lambda f, rows, P: (
                (lambda t: f.mul(f.mul(f.mul(f.mul(t, t), t), t), t))(
                    f.add(rows[0][0], P["k"])),
            ),
            boundaries=(Boundary(0, 0, "input"), Boundary(0, -1, "output")),
            params={"k": 777},
            register=False,
        )
        a = np.asarray(const_spec.build_trace(self.CFG))
        b = np.asarray(param_spec.build_trace(self.CFG))
        assert (a == b).all()

    def test_goldilocks_periodic(self):
        spec = AirSpec(
            name="mimc5rc-goldi", columns=1, init=((("x0", 987654321),),),
            step=lambda f, rows, P: (
                (lambda t: f.mul(f.mul(f.mul(f.mul(t, t), t), t), t))(
                    f.add(rows[0][0], P["rc"])),
            ),
            boundaries=(Boundary(0, 0, "input"), Boundary(0, -1, "output")),
            periodic={"rc": (11, 2**63 + 5, 3, 2**40)},
        )
        cfg = ProverConfig(
            modulus=GOLDILOCKS, generator=7, log2_trace=5, blowup=8,
            num_queries=4,
        )
        proof = prove(cfg, air=spec())
        assert verify(proof)
        x = 987654321
        rc = (11, 2**63 + 5, 3, 2**40)
        for t in range(cfg.trace_length - 1):
            x = pow((x + rc[t % 4]) % GOLDILOCKS, 5, GOLDILOCKS)
        assert proof.publics["output"] == x

    def test_bad_cycle_length(self):
        with pytest.raises(ValueError, match="power of two"):
            AirSpec(
                name="badp1", columns=1, init=((("x0", 1),),),
                step=lambda f, rows, P: (f.add(rows[0][0], P["rc"]),),
                boundaries=(
                    Boundary(0, 0, "input"), Boundary(0, -1, "output"),
                ),
                periodic={"rc": (1, 2, 3)},
                register=False,
            )

    def test_cycle_too_long_for_domain(self):
        spec = AirSpec(
            name="badp2", columns=1, init=((("x0", 1),),),
            step=lambda f, rows, P: (f.add(rows[0][0], P["rc"]),),
            boundaries=(Boundary(0, 0, "input"), Boundary(0, -1, "output")),
            periodic={"rc": tuple(range(32))},
            register=False,
        )
        with pytest.raises(ValueError, match="N/2"):
            spec.validate(ProverConfig(log2_trace=5, blowup=4, num_queries=4))

    def test_param_periodic_collision(self):
        with pytest.raises(ValueError, match="param and periodic"):
            AirSpec(
                name="badp3", columns=1, init=((("x0", 1),),),
                step=lambda f, rows, P: (f.add(rows[0][0], P["k"]),),
                boundaries=(
                    Boundary(0, 0, "input"), Boundary(0, -1, "output"),
                ),
                params={"k": 1},
                periodic={"k": (1, 2)},
                register=False,
            )
