"""Device-resident Fiat-Shamir fuzz tests: random absorb/draw interleavings
must match the host channel's hex-string state machine byte-for-byte
(the double-hex expansion is easy to get subtly wrong — SURVEY §7.3.2)."""

import hashlib

import numpy as np
import pytest

import jax.numpy as jnp

from stark_tpu.channel import Channel
from stark_tpu.channel.device_channel import DeviceFS
from stark_tpu.config import DEFAULT_MODULUS, TEST_MODULUS


def _digest_arr(b: bytes):
    return jnp.asarray(np.frombuffer(b, dtype=">u4").astype(np.uint32))


@pytest.mark.parametrize("p", [TEST_MODULUS, DEFAULT_MODULUS])
@pytest.mark.parametrize("seed", [0, 1])
def test_random_interleavings_match_host(p, seed):
    rng = np.random.default_rng(seed)
    host = Channel(p)
    fs = DeviceFS(p)
    first = True
    for step in range(12):
        if first or rng.random() < 0.5:
            d = hashlib.sha256(bytes([seed, step])).digest()
            host.send(d.hex().encode())
            fs.absorb_root(_digest_arr(d))
            first = False
        else:
            host.receive_random_field_element()
            fs.draw()
    # finalize replays into a fresh channel; must equal the host transcript
    replay = Channel(p)
    fs.finalize(replay)
    assert replay.proof == host.proof
    assert replay.state == host.state


def test_nonempty_initial_state():
    p = DEFAULT_MODULUS
    host = Channel(p)
    host.send(b"prefix-message")  # arbitrary bytes before the FS takes over
    fs = DeviceFS(p, host.state)
    d = hashlib.sha256(b"root").digest()
    host.send(d.hex().encode())
    beta = host.receive_random_field_element()
    fs.absorb_root(_digest_arr(d))
    v = fs.draw()
    replay = Channel(p)
    replay.send(b"prefix-message")
    fs.finalize(replay)
    assert replay.state == host.state
    assert int(np.asarray(v)) == beta.value


@pytest.mark.parametrize("value", [0, 1, 2338775057, (1 << 63) + 12345,
                                   (1 << 64) - 1])
def test_absorb_value_matches_host_send(value):
    """absorb_value (the FRI final-constant send framing, used by the
    single-fetch prove) must match channel.send(value.to_bytes(8))."""
    import jax

    from stark_tpu.channel.device_channel import absorb_value

    p = DEFAULT_MODULUS
    host = Channel(p)
    host.send(b"seed")
    state = _digest_arr(bytes.fromhex(host.state))
    host.send(int(value).to_bytes(8, "big"))
    hi = jnp.uint32(value >> 32)
    lo = jnp.uint32(value & 0xFFFFFFFF)
    dev = jax.jit(absorb_value)(state, hi, lo)
    dev_hex = np.asarray(dev).astype(">u4").tobytes().hex()
    assert dev_hex == host.state


def test_draw_before_absorb_raises():
    with pytest.raises(ValueError, match="empty channel state"):
        DeviceFS(DEFAULT_MODULUS).draw()


def test_finalize_divergence_detected():
    p = DEFAULT_MODULUS
    fs = DeviceFS(p)
    d = hashlib.sha256(b"x").digest()
    fs.absorb_root(_digest_arr(d))
    fs.draw()
    fs.log[1] = ("draw", jnp.uint32(12345))  # corrupt the logged draw
    with pytest.raises(RuntimeError, match="diverged"):
        fs.finalize(Channel(p))
