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


def verify(proof: StarkProof, air=None) -> bool:
    """Verify a STARK proof against its public statement.
    Raises StarkVerificationError on failure; True on success."""
    cfg = proof.config
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

        for q in range(cfg.num_queries):
            idx = ch.receive_random_int(0, M - max_off - 1, True)
            opened = []
            for off in offsets:
                val = int.from_bytes(ch.read(), "big")
                path = ch.read()
                if not MerkleTree.validate(
                    trace_root, path, idx + off, val.to_bytes(8, "big"), M
                ):
                    raise StarkVerificationError(
                        f"query {q}: trace Merkle proof fails at offset {off}"
                    )
                opened.append(val)
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
    return True
