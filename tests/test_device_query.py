"""Device-resident query phase (channel/device_query.py): the one-program
decommitment must be byte-identical to the host per-query loop (VERDICT
r1 item 2), and its index derivation must match int(hex, 16) mod rng."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.channel import device_query as dq
from stark_tpu.channel.channel import Channel
from stark_tpu.config import DEFAULT_GENERATOR, DEFAULT_MODULUS, ProverConfig
from stark_tpu.stark.prover import prove
from stark_tpu.stark.verifier import verify


def _cfg(log2_trace=10, blowup=4, num_queries=4):
    return ProverConfig(
        modulus=DEFAULT_MODULUS,
        generator=DEFAULT_GENERATOR,
        log2_trace=log2_trace,
        blowup=blowup,
        num_queries=num_queries,
    )


def test_mod_state_matches_int_mod():
    rs = np.random.RandomState(7)
    for rng in (1, 2, 3, 1000, 1 << 20, (1 << 27) - 12, (1 << 32) - 1,
                (1 << 31) + 1):
        weights = jnp.asarray(dq._mod_weights(rng))
        for _ in range(4):
            words = rs.randint(0, 1 << 32, size=8, dtype=np.uint64).astype(
                np.uint32)
            hexs = b"".join(int(w).to_bytes(4, "big") for w in words).hex()
            want = int(hexs, 16) % rng
            got = int(dq._mod_state(jnp.asarray(words), weights, rng))
            assert got == want, (rng, hexs)


def test_hex_rows_matches_hex():
    d = jnp.asarray(
        np.random.RandomState(0).randint(0, 1 << 32, size=(3, 8),
                                         dtype=np.uint64).astype(np.uint32))
    out = np.asarray(dq._hex_rows(d))
    for r in range(3):
        raw = b"".join(int(w).to_bytes(4, "big") for w in np.asarray(d[r]))
        want = raw.hex().encode()
        got = b"".join(int(w).to_bytes(4, "big") for w in out[r])
        assert got == want


def test_prove_device_queries_byte_identical_to_host_loop(monkeypatch):
    cfg = _cfg()
    monkeypatch.setenv("STARK_TPU_HOST_QUERIES", "1")
    host = prove(cfg, a1=777)
    monkeypatch.delenv("STARK_TPU_HOST_QUERIES")
    dev = prove(cfg, a1=777)
    assert [bytes(m) for m in host.proof] == [bytes(m) for m in dev.proof]
    assert verify(dev, expected_config=cfg)


def test_device_queries_standalone_fri(monkeypatch):
    """decommit_fri's device path emits the same transcript as the
    host loop."""
    from stark_tpu.fri.commit import decommit_fri, fri_commit
    from stark_tpu.ntt.ntt import coset_evaluate
    from stark_tpu.poly import ops as poly_ops

    p = DEFAULT_MODULUS
    n = 1 << 9
    coeffs = jnp.asarray(
        np.random.RandomState(3).randint(0, p, size=n // 8, dtype=np.int64)
        .astype(np.uint32))
    evals = coset_evaluate(coeffs, p, n, DEFAULT_GENERATOR)

    def run():
        ch = Channel(p)
        proof = fri_commit(evals, p, DEFAULT_GENERATOR, ch)
        decommit_fri(3, n - 1, proof.fri_layers, proof.fri_merkles, ch)
        return [bytes(m) for m in ch.proof]

    monkeypatch.setenv("STARK_TPU_HOST_QUERIES", "1")
    host = run()
    monkeypatch.delenv("STARK_TPU_HOST_QUERIES")
    dev = run()
    assert host == dev


def test_divergence_detection():
    """A corrupted device index is caught by the host replay."""
    cfg = _cfg()
    plan = dq.get_plan(100, 2, (0,), 16, (16, 8))
    import functools

    import jax

    real_run = jax.jit(functools.partial(plan._run, mode=0))

    class Fake:
        def __call__(self, *a, **k):
            final, (idxs, outs) = real_run(*a, **k)
            return final, (idxs + jnp.uint32(1), outs)

    plan._jit_cache[0] = Fake()
    try:
        ch = Channel(cfg.modulus)
        ch.send(b"seed")
        f_evals = jnp.arange(16, dtype=jnp.uint32)
        from stark_tpu.merkle.tree import MerkleTree

        t0 = MerkleTree(f_evals)
        l1 = jnp.arange(8, dtype=jnp.uint32)
        t1 = MerkleTree(l1)
        with pytest.raises(RuntimeError, match="diverged"):
            plan.run(ch, f_evals, t0.levels[:-1], [f_evals, l1],
                     [t0.levels[:-1], t1.levels[:-1]])
    finally:
        plan._jit_cache.pop(0, None)
        dq.get_plan.cache_clear()


def test_supported_gate():
    assert dq.supported(100, 1 << 10, (8, 4, 2, 1))
    assert not dq.supported(100, 1000, (8,))       # non-power-of-two trace
    assert not dq.supported(100, 1 << 10, (12,))   # non-power-of-two layer
    assert not dq.supported(1 << 32, 1 << 10, (8,))
    assert not dq.supported(0, None, (8,))


def test_supported_all_shipped_families_both_fields():
    """VERDICT r2 task 4's done-bar: the device query path accepts every
    shipped family's (num_columns, width) over BOTH field widths — no
    silent host-loop fallback remains for any shipped configuration."""
    import stark_tpu.stark.families as fam
    from stark_tpu.fields.fp import Fp
    from stark_tpu.stark import FibMulAIR, FibonacciSquareAIR, MimcAIR

    families = [FibonacciSquareAIR(), MimcAIR(), FibMulAIR(),
                fam.TRIBMUL, fam.MIMC5, fam.MIMC5RC]
    for p in (3 * 2**30 + 1, 2**64 - 2**32 + 1):
        width = Fp.get(p).width
        for air in families:
            ncols = getattr(air, "num_columns", 1)
            M = 1 << 12
            shifts = getattr(air, "shifts", (0, 1, 2))
            fri_lengths = tuple(M >> k for k in range(11))
            rng = M - max(s * 4 for s in shifts)
            assert dq.supported(rng, M, fri_lengths, ncols, width), (
                f"{air.name} over p={p} (C={ncols}, w={width}) not "
                "device-supported")


def test_four_column_value_framing_roundtrip(monkeypatch):
    """A 4-column row message is 64 payload hex chars — exactly one full
    block plus a pad-only tail — exercising the multi-block value
    framing no <=3-column family reaches.  Prove + verify + the host
    fallback transcript must agree byte for byte."""
    from stark_tpu.config import ProverConfig
    from stark_tpu.stark import prove, verify
    from stark_tpu.stark.air_builder import AirSpec, Boundary

    spec = AirSpec(
        name="quadmul-test",
        columns=4,
        init=((("a0", 1), ("b0", 2), ("c0", 3), ("d0", 4)),),
        step=lambda f, rows, P: (
            rows[0][1], rows[0][2], rows[0][3],
            f.add(f.mul(rows[0][0], rows[0][1]), rows[0][3]),
        ),
        boundaries=(
            Boundary(column=0, row=0, public="input"),
            Boundary(column=1, row=0, public="b0"),
            Boundary(column=2, row=0, public="c0"),
            Boundary(column=3, row=0, public="d0"),
            Boundary(column=3, row=-1, public="output"),
        ),
        register=False,
    )
    import stark_tpu.stark.prover as prov

    taken = []
    orig = prov._prove_single_fetch

    def spy(*a, **k):
        taken.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(prov, "_prove_single_fetch", spy)
    cfg = ProverConfig(log2_trace=5, blowup=4, num_queries=3)
    pf = prove(cfg, air=spec)
    assert taken or prov.LAST_PROVE_PATH == "mega", (
        "4-column spec fell back to the host query loop: "
        f"{prov.LAST_PROVE_PATH}")
    assert verify(pf, air=spec)
    monkeypatch.setenv("STARK_TPU_HOST_QUERIES", "1")
    pf2 = prove(cfg, air=spec)
    assert pf.proof == pf2.proof


def test_tribmul_goldilocks_roundtrip(monkeypatch):
    """3 columns x 64-bit limb pairs through the declarative builder and
    the single-fetch query program."""
    from stark_tpu.config import ProverConfig
    from stark_tpu.stark import prove, verify
    from stark_tpu.stark.families import TRIBMUL

    cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                       log2_trace=5, blowup=4, num_queries=3)
    pf = prove(cfg, air=TRIBMUL)
    assert verify(pf)
    monkeypatch.setenv("STARK_TPU_HOST_QUERIES", "1")
    pf2 = prove(cfg, air=TRIBMUL)
    assert pf.proof == pf2.proof
