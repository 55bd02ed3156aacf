"""STARK verifier — host side, replays the full prove transcript,
generic over the AIR.

Checks, per query: the trace openings (one per AIR shift) against the
trace Merkle root, the recomputed composition value against the FRI
layer-0 opening (binding trace to FRI), every FRI layer's Merkle proofs,
the fold relation between layers, and the final constant.  All challenges
(alphas, betas, query indices) are re-derived from the transcript — any
tampering desynchronizes the Fiat-Shamir state and fails.
"""

from __future__ import annotations

from stark_tpu.channel.channel import ChannelError, VerifierChannel
from stark_tpu.fri.verify import (
    FRIVerificationError,
    replay_commit,
    verify_query_layers,
)
from stark_tpu.merkle.tree import MerkleTree
from stark_tpu.ntt.reference_ntt import root_of_unity
from stark_tpu.stark.prover import StarkProof, get_air_context


class StarkVerificationError(Exception):
    pass


def verify(proof: StarkProof, air=None, *, expected_config=None,
           expected_publics=None, min_queries: int = 1) -> bool:
    """Verify a STARK proof against its public statement.
    Raises StarkVerificationError on failure; True on success.

    Security note: `proof.config` and `proof.publics` travel WITH the
    proof, i.e. they are attacker-controlled.  A verifier that cares about
    a specific statement/security level must pin them: pass
    `expected_config` (the ProverConfig the protocol mandates) and/or
    `expected_publics` (the claimed statement) and they are compared
    before any transcript replay.  Independently, floor parameters are
    always enforced: `cfg.validate()` (blowup >= 2 a power of two,
    num_queries >= 1) plus the caller-settable `min_queries`.
    """
    cfg = proof.config
    if expected_config is not None and cfg != expected_config:
        raise StarkVerificationError(
            f"proof config {cfg} != expected {expected_config}"
        )
    if expected_publics is not None and dict(proof.publics) != dict(expected_publics):
        raise StarkVerificationError(
            f"proof publics {proof.publics} != expected {expected_publics}"
        )
    try:
        cfg.validate()
    except ValueError as e:
        raise StarkVerificationError(f"insecure/invalid config: {e}") from e
    if cfg.num_queries < min_queries:
        raise StarkVerificationError(
            f"proof has {cfg.num_queries} queries < required {min_queries}"
        )
    if air is None:
        from stark_tpu.stark.air import air_from_name

        air = air_from_name(proof.air_name, proof.publics)
    air.validate(cfg)
    p = cfg.modulus
    M = cfg.eval_domain_size
    b = cfg.blowup
    h = cfg.offset
    w = root_of_unity(p, M)
    ctx = get_air_context(air, cfg)
    offsets = [s * b for s in air.shifts]
    max_off = max(offsets)
    publics = proof.publics

    try:
        ch = VerifierChannel(p, proof.proof)
        trace_root = ch.read().decode()
        alphas = tuple(
            ch.receive_random_field_element().value for _ in range(air.num_alphas)
        )
        roots, betas, final_value = replay_commit(ch, air.num_folds(cfg))

        ncols = getattr(air, "num_columns", 1)
        for q in range(cfg.num_queries):
            idx = ch.receive_random_int(0, M - max_off - 1, True)
            opened = []
            for off in offsets:
                # row message: ncols values, 8-byte BE each; its raw bytes
                # are exactly the committed leaf's preimage
                msg = ch.read()
                if len(msg) != 8 * ncols:
                    raise StarkVerificationError(
                        f"query {q}: row opening is {len(msg)} bytes, "
                        f"expected {8 * ncols}"
                    )
                path = ch.read()
                if not MerkleTree.validate(
                    trace_root, path, idx + off, msg, M
                ):
                    raise StarkVerificationError(
                        f"query {q}: trace Merkle proof fails at offset {off}"
                    )
                vals = [int.from_bytes(msg[8 * i : 8 * i + 8], "big")
                        for i in range(ncols)]
                opened.append(vals[0] if ncols == 1 else tuple(vals))
            x = h * pow(w, idx, p) % p
            cp_expected = ctx.cp_at(x, opened, alphas, publics)
            verify_query_layers(
                ch, idx, roots, betas, final_value, p, M, h,
                expect_first=cp_expected, label=f"query {q}: ",
            )
        if ch.cursor != len(proof.proof):
            raise StarkVerificationError(
                f"{len(proof.proof) - ch.cursor} unread trailing messages"
            )
    except (ChannelError, FRIVerificationError) as e:
        raise StarkVerificationError(str(e)) from e
    except (UnicodeDecodeError, OverflowError, ValueError) as e:
        # malformed transcript bytes (non-UTF-8 root message, oversized
        # value message, bad hex) are rejections, not crashes
        raise StarkVerificationError(f"malformed transcript: {e!r}") from e
    return True
