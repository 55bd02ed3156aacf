"""Transcript compression (channel/compress.py): exact round-trip, real
size wins on genuine proofs, corrupt-container rejection.

The reference's compressed_proof never compresses (channel.rs:42-43
pushes every message to both logs verbatim); ours is a serialization
layer that deduplicates Merkle path nodes, repeated messages, and
hex-string roots while reconstructing the transcript byte-exactly.
"""

import os
import random

import pytest

from stark_tpu.channel.compress import (
    CompressionError,
    compress_messages,
    compressed_size,
    decompress_messages,
)


@pytest.fixture(scope="module")
def small_proof():
    from stark_tpu.config import ProverConfig
    from stark_tpu.stark import prove

    return prove(ProverConfig(log2_trace=6, blowup=4, num_queries=4))


def _roundtrip(msgs):
    blob = compress_messages(msgs)
    assert decompress_messages(blob) == [bytes(m) for m in msgs]
    return blob


class TestRoundTrip:
    def test_empty(self):
        assert _roundtrip([]) is not None

    def test_literals(self):
        _roundtrip([b"", b"\x00", b"hello", bytes(range(31)), bytes(33)])

    def test_hex_ascii_packs(self):
        root = b"ab" * 32  # 64 lowercase-hex chars, as Merkle roots travel
        blob = _roundtrip([root, root[:10]])
        assert len(blob) < 64  # packed to 32 + framing

    def test_node_dedup(self):
        rng = random.Random(7)
        nodes = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(4)]
        # two "paths" sharing 3 of 4 nodes
        m1 = b"".join(nodes)
        m2 = b"".join(nodes[:3]) + bytes(rng.randrange(256) for _ in range(32))
        blob = _roundtrip([m1, m2])
        assert len(blob) < len(m1) + len(m2)  # refs beat re-sending

    def test_repeated_message(self):
        m = os.urandom(8)
        blob = _roundtrip([m, m, m, os.urandom(40), m])
        assert len(blob) < 4 * 8 + 40

    def test_random_fuzz_roundtrip(self):
        rng = random.Random(1234)
        for _ in range(50):
            msgs = []
            for _ in range(rng.randrange(0, 20)):
                kind = rng.randrange(4)
                if kind == 0:
                    msgs.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40))))
                elif kind == 1:
                    msgs.append(("%02x" % rng.randrange(256) * rng.randrange(1, 5)).encode())
                elif kind == 2:
                    msgs.append(bytes(rng.randrange(256) for _ in range(32 * rng.randrange(1, 4))))
                else:
                    msgs.append(msgs[rng.randrange(len(msgs))] if msgs else b"x")
            _roundtrip(msgs)


class TestRejection:
    def test_bad_magic(self):
        with pytest.raises(CompressionError):
            decompress_messages(b"XX1\x00")

    def test_truncation_and_bitflips(self):
        msgs = [b"ab" * 32, os.urandom(64), os.urandom(8), os.urandom(64)]
        blob = compress_messages(msgs)
        for cut in range(4, len(blob), 7):
            try:
                out = decompress_messages(blob[:cut])
            except CompressionError:
                continue
            assert out != msgs  # never silently reconstructs from a prefix

    def test_trailing_bytes_rejected(self):
        blob = compress_messages([b"hi"])
        with pytest.raises(CompressionError):
            decompress_messages(blob + b"\x00")


class TestOnRealProof:
    def test_proof_container_roundtrip_and_ratio(self, small_proof):
        from stark_tpu.stark import StarkProof, verify

        blob = small_proof.serialize(compress=True)
        back = StarkProof.deserialize(blob)
        assert back.proof == small_proof.proof
        assert back.config == small_proof.config
        assert back.publics == small_proof.publics
        assert verify(back)
        # the dedup must actually win on a genuine transcript
        ratio = len(blob) / len(small_proof.serialize())
        assert small_proof.compressed_size_bytes() < small_proof.size_bytes()
        assert ratio < 0.55, f"compressed container ratio {ratio:.2f}"

    def test_corrupt_container_rejected(self, small_proof):
        from stark_tpu.stark import StarkProof

        blob = bytearray(small_proof.serialize(compress=True))
        blob[len(blob) // 2] ^= 0xFF
        try:
            back = StarkProof.deserialize(bytes(blob))
        except Exception:
            return  # rejected at parse: fine
        # parsed despite corruption: transcript must differ, and verify
        # of a differing transcript is covered by tamper tests
        assert back.proof != small_proof.proof
