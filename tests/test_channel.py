"""Fiat-Shamir channel tests — the reference has ZERO channel tests
(SURVEY §2.6); its exact semantics are frozen here, each hex state
recomputed independently with hashlib.
"""

import hashlib

import pytest

from stark_tpu.channel import Channel, VerifierChannel, ChannelError
from stark_tpu.config import DEFAULT_MODULUS

P = DEFAULT_MODULUS


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


class TestSend:
    def test_state_is_hash_of_hex_string(self):
        # send hashes utf8("" + hex(msg)) — strings, not raw bytes
        # (channel.rs:35-44)
        ch = Channel(P)
        ch.send(b"\xab\xcd")
        assert ch.state == _h("abcd")
        assert ch.proof == [b"\xab\xcd"]
        assert ch.compressed_proof == [b"\xab\xcd"]

    def test_state_chains_string_concat(self):
        ch = Channel(P)
        ch.send(b"\x01")
        s1 = _h("01")
        ch.send(b"\x02\x03")
        assert ch.state == _h(s1 + "0203")

    def test_empty_message(self):
        ch = Channel(P)
        ch.send(b"")
        assert ch.state == _h("")


class TestReceive:
    def test_draw_before_send_raises(self):
        # reference panics on U256::from_str_radix("") (channel.rs:64-65)
        ch = Channel(P)
        with pytest.raises(ChannelError):
            ch.receive_random_int(0, 10)

    def test_random_int_value_and_state(self):
        ch = Channel(P)
        ch.send(b"\x11")
        s = ch.state
        num = ch.receive_random_int(0, 99, show_in_proof=False)
        # num = (state + min) % range (channel.rs:69-72)
        assert num == int(s, 16) % 100
        # state advances by hashing the old hex string (channel.rs:75-76)
        assert ch.state == _h(s)
        assert len(ch.proof) == 1  # not shown

    def test_min_shifts_not_offsets(self):
        # the reference's STARK-101 deviation: result stays in [0, range)
        ch1 = Channel(P)
        ch1.send(b"\x22")
        n0 = ch1.receive_random_int(0, 9)
        ch2 = Channel(P)
        ch2.send(b"\x22")
        n5 = ch2.receive_random_int(5, 14)  # same range size 10
        assert n5 == (n0 + 5) % 10
        assert 0 <= n5 < 10  # NOT in [5, 14] — frozen quirk

    def test_show_in_proof_pushes_8_byte_be(self):
        ch = Channel(P)
        ch.send(b"\x33")
        num = ch.receive_random_int(0, 1 << 40, show_in_proof=True)
        assert ch.proof[-1] == num.to_bytes(8, "big")

    def test_field_element_draw(self):
        ch = Channel(P)
        ch.send(b"\x44")
        s = ch.state
        el = ch.receive_random_field_element()
        assert el.value == int(s, 16) % P
        # value pushed to proof (channel.rs:52) but not compressed_proof
        assert ch.proof[-1] == el.value.to_bytes(8, "big")
        assert ch.compressed_proof == [b"\x44"]

    def test_proof_sizes(self):
        ch = Channel(P)
        ch.send(b"\x01\x02")
        ch.receive_random_field_element()
        assert ch.proof_size() == 2 + 8
        assert ch.compressed_proof_size() == 2


class TestDeterminism:
    def test_transcripts_reproducible(self):
        def run():
            ch = Channel(P)
            ch.send(b"root-1")
            a = ch.receive_random_field_element()
            ch.send(b"root-2")
            b = ch.receive_random_int(0, 8191, True)
            return a.value, b, ch.state, [bytes(m) for m in ch.proof]

        assert run() == run()


class TestVerifierChannel:
    def test_replay_rederives_challenges(self):
        ch = Channel(P)
        ch.send(b"commitment-a")
        beta = ch.receive_random_field_element()
        ch.send(b"commitment-b")
        idx = ch.receive_random_int(0, 1023, show_in_proof=True)

        v = VerifierChannel(P, ch.proof)
        assert v.read() == b"commitment-a"
        assert v.receive_random_field_element() == beta
        assert v.read() == b"commitment-b"
        assert v.receive_random_int(0, 1023, show_in_proof=True) == idx
        assert v.state == ch.state
        assert v.cursor == len(ch.proof)

    def test_empty_range_raises_channel_error(self):
        # the verifier is the adversarial-input surface: rng <= 0 must be
        # a ChannelError, not a bare ZeroDivisionError (mirrors the
        # prover-side guard; VERDICT r3 weak #5)
        ch = Channel(P)
        ch.send(b"x")
        v = VerifierChannel(P, ch.proof)
        v.read()
        with pytest.raises(ChannelError, match="empty range"):
            v.receive_random_int(5, 4)
        with pytest.raises(ChannelError, match="empty range"):
            v.receive_random_int(0, -1)

    def test_replay_detects_tampering(self):
        ch = Channel(P)
        ch.send(b"x")
        ch.receive_random_field_element()
        tampered = list(ch.proof)
        tampered[1] = (int.from_bytes(tampered[1], "big") ^ 1).to_bytes(8, "big")
        v = VerifierChannel(P, tampered)
        v.read()
        with pytest.raises(ChannelError):
            v.receive_random_field_element()

    def test_exhausted_transcript(self):
        v = VerifierChannel(P, [b"a"])
        v.read()
        with pytest.raises(ChannelError):
            v.read()


class TestSerialization:
    def test_roundtrip(self):
        ch = Channel(P)
        ch.mark_phase("trace-commit")
        ch.send(b"\x01\x02")
        ch.mark_phase("fri")
        ch.receive_random_field_element()
        back = Channel.deserialize(ch.serialize())
        assert back.proof == ch.proof
        assert back.phases == ch.phases
        assert back.modulus == P

    def test_resume_equals_fresh(self):
        # checkpoint/resume (SURVEY §5.4): replaying the proof log restores
        # the exact Fiat-Shamir state
        ch = Channel(P)
        ch.send(b"m1")
        ch.receive_random_field_element()
        ch.send(b"m2")

        v = VerifierChannel(P, ch.proof)
        v.read()
        v.receive_random_field_element()
        v.read()
        assert v.state == ch.state
