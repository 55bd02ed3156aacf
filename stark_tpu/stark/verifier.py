"""STARK verifier — host side, replays the full prove transcript.

Checks, per query: the three trace openings against the trace Merkle root,
the recomputed composition value against the FRI layer-0 opening (binding
trace to FRI), every FRI layer's Merkle proofs, the fold relation between
layers, and the final constant.  All challenges (alphas, betas, query
indices) are re-derived from the transcript — any tampering desynchronizes
the Fiat-Shamir state and fails.
"""

from __future__ import annotations

from stark_tpu.channel.channel import ChannelError, VerifierChannel
from stark_tpu.config import ProverConfig
from stark_tpu.fri.verify import (
    FRIVerificationError,
    replay_commit,
    verify_query_layers,
)
from stark_tpu.merkle.tree import MerkleTree
from stark_tpu.ntt.reference_ntt import root_of_unity
from stark_tpu.stark.composition import get_context
from stark_tpu.stark.prover import StarkProof


class StarkVerificationError(Exception):
    pass


def verify(proof: StarkProof) -> bool:
    """Verify a STARK proof against its public statement (a0, a_last).
    Raises StarkVerificationError on failure; True on success."""
    cfg = proof.config
    cfg.validate()
    p = cfg.modulus
    M = cfg.eval_domain_size
    b = cfg.blowup
    h = cfg.offset
    w = root_of_unity(p, M)
    ctx = get_context(cfg)

    try:
        ch = VerifierChannel(p, proof.proof)
        trace_root = ch.read().decode()
        alphas = tuple(ch.receive_random_field_element().value for _ in range(3))
        roots, betas, final_value = replay_commit(ch, cfg.log2_trace)

        for q in range(cfg.num_queries):
            idx = ch.receive_random_int(0, M - 2 * b - 1, True)
            opened = []
            for off in (0, b, 2 * b):
                val = int.from_bytes(ch.read(), "big")
                path = ch.read()
                if not MerkleTree.validate(
                    trace_root, path, idx + off, val.to_bytes(8, "big"), M
                ):
                    raise StarkVerificationError(
                        f"query {q}: trace Merkle proof fails at offset {off}"
                    )
                opened.append(val)
            fx, fgx, fg2x = opened
            x = h * pow(w, idx, p) % p
            cp_expected = ctx.cp_at(
                x, fx, fgx, fg2x, alphas, proof.a0, proof.a_last
            )
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
