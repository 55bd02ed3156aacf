"""Device-resident Fiat-Shamir state machine.

The host channel (stark_tpu.channel.channel) is the canonical transcript,
but driving it during the commit phases forces a host<->device round trip
per commitment (fetch root -> absorb -> upload challenge).  This module
reproduces the EXACT state machine on device — SHA-256 over the UTF-8
bytes of concatenated hex strings (channel.rs:35-44), including the
double hex expansion (messages are themselves ASCII-hex root strings,
fri_commit.rs:86: ``send(root().to_vec())``) — so the whole
commit->challenge->fold chain pipelines on device with ZERO syncs; the
host replays the canonical transcript afterwards from one batched fetch
of the root digests and asserts the states agree by construction.

State representation: the 8 uint32 digest words whose lowercase hex IS
the channel's state string.  All inputs here are 32-byte digests (the
only message type the commit phases send), so block layouts are static:

* absorb (empty state):   128 bytes  -> 2 blocks + pad block
* absorb (64-char state): 192 bytes  -> 3 blocks + pad block
* advance (draw):          64 bytes  -> 1 block  + pad block
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stark_tpu.fields.fp import Fp
from stark_tpu.hash.sha256_jax import _H0, _compress_fixed

_U32 = jnp.uint32


def _nibbles(words):
    """(k,) u32 -> (8k,) u32 of nibbles, most significant first."""
    out = []
    for i in range(words.shape[0]):
        w = words[i]
        for s in range(28, -4, -4):
            out.append((w >> _U32(s)) & _U32(0xF))
    return jnp.stack(out)


def ascii_hex_words(d):
    """(..., k) u32 big-endian words -> (..., 2k) u32: the UTF-8 bytes of
    the lowercase hex string, packed big-endian 4 chars per word (what
    SHA consumes).  Width-generic — the single shared implementation of
    this transcript-critical layout (device_query's block streams use it
    too; only the Pallas chain kernel keeps its own, kernel-constrained
    copy in hash/pallas_chain.py)."""
    shifts = jnp.arange(28, -4, -4, dtype=_U32)              # (8,)
    nib = (d[..., :, None] >> shifts) & _U32(0xF)            # (..., k, 8)
    nib = nib.reshape(d.shape[:-1] + (d.shape[-1] * 8,))
    ch = jnp.where(nib < _U32(10), _U32(0x30) + nib, _U32(0x57) + nib)
    ch4 = ch.reshape(d.shape[:-1] + (d.shape[-1] * 2, 4))
    return (
        (ch4[..., 0] << _U32(24)) | (ch4[..., 1] << _U32(16))
        | (ch4[..., 2] << _U32(8)) | ch4[..., 3]
    )


_ascii_hex_words = ascii_hex_words


def _double_hex_words(digest):
    """(8,) u32 digest -> (32,) u32: hex(utf8-hex(digest)) packed — the
    bytes send() hashes when the message is itself an ASCII hex string.

    nibble v expands to two chars: ('3' if v<10 else '6') and
    chr(0x30 + (v if v<10 else v-9))."""
    nib = _nibbles(digest)  # (64,)
    hi = jnp.where(nib < _U32(10), _U32(0x33), _U32(0x36))
    lo = _U32(0x30) + jnp.where(nib < _U32(10), nib, nib - _U32(9))
    ch = jnp.stack([hi, lo], axis=1).reshape(-1)  # (128,) chars
    ch4 = ch.reshape(-1, 4)
    return (
        (ch4[:, 0] << _U32(24)) | (ch4[:, 1] << _U32(16))
        | (ch4[:, 2] << _U32(8)) | ch4[:, 3]
    )


def _sha(words, total_bytes: int):
    """SHA-256 of a packed big-endian char-word sequence of static length
    (multiple of 64 bytes), on device, single lane."""
    state = [jnp.full((), _U32(h)) for h in _H0]
    blocks = [words[i * 16 : (i + 1) * 16] for i in range(total_bytes // 64)]
    for blk in blocks:
        state = _compress_fixed(state, [blk[i] for i in range(16)])
    # padding block (message length is a multiple of 64)
    zero = jnp.zeros((), _U32)
    pad = [jnp.full((), _U32(0x80000000))] + [zero] * 14 + [
        jnp.full((), _U32(total_bytes * 8))
    ]
    state = _compress_fixed(state, pad)
    return jnp.stack(state)


def absorb_digest(state, digest):
    """send(hex_string_of(digest).encode()): state' words.
    `state` is an (8,) u32 array or None (initial empty state)."""
    msg = _double_hex_words(digest)  # (32,) words = 128 bytes
    if state is None:
        return _sha(msg, 128)
    st = _ascii_hex_words(state)  # (16,) words = 64 bytes
    return _sha(jnp.concatenate([st, msg]), 192)


def advance(state):
    """state' = sha256(utf8(state_hex)) (channel.rs:75-76)."""
    return _sha(_ascii_hex_words(state), 64)


def absorb_value(state, hi, lo):
    """send(value.to_bytes(8, 'big')): the 80-byte message = 64-char state
    hex + 16 hex chars of the value, SHA padding inside the second block
    (the framing FRI's final-constant send uses, fri_commit.rs:114)."""
    st = _ascii_hex_words(state)                 # (16,) words, block 1
    hv = _ascii_hex_words(jnp.stack([hi, lo]))   # (4,) words = 16 chars
    zero = jnp.zeros((), _U32)
    tail = [jnp.full((), _U32(0x80000000))] + [zero] * 10 + [
        jnp.full((), _U32(80 * 8))
    ]
    s = [jnp.full((), _U32(x)) for x in _H0]
    s = _compress_fixed(s, [st[i] for i in range(16)])
    s = _compress_fixed(s, [hv[i] for i in range(4)] + tail)
    return jnp.stack(s)


def state_mod(state, p: int):
    """int(state_hex, 16) mod p as a canonical field element — the
    receive_random_int value for min=0, range=p (channel.rs:69-72).
    Width-generic: a u32 scalar for p < 2^32, a (2,) limb pair for the
    Goldilocks field."""
    f = Fp.get(p)
    r = f.const((1 << 32) % p)  # 2^32 mod p
    if f.width == 1:
        acc = jnp.zeros((), _U32)
        for i in range(8):
            w = state[i] % _U32(p)  # reduce the raw u32 word
            acc = f.add(f.mul(acc, r), w)
        return acc
    acc = f.const(0)
    zero = jnp.zeros((), _U32)
    for i in range(8):
        w = jnp.stack([zero, state[i]])  # raw word < 2^32 <= p: canonical
        acc = f.add(f.mul(acc, r), w)
    return acc


def draw_field_element(state, p: int):
    """(value, new_state) of receive_random_field_element — value equals
    the low 64 bits of state mod p (exact for p <= 2^64)."""
    return state_mod(state, p), advance(state)


@functools.lru_cache(maxsize=None)
def jit_absorb_initial():
    return jax.jit(lambda d: absorb_digest(None, d))


@functools.lru_cache(maxsize=None)
def jit_absorb():
    return jax.jit(absorb_digest)


@functools.lru_cache(maxsize=None)
def jit_draw(p: int):
    return jax.jit(lambda s: draw_field_element(s, p))


@functools.lru_cache(maxsize=None)
def jit_absorb_value():
    return jax.jit(absorb_value)


_rep_fns: dict = {}


def _replicate_fn(mesh):
    """Cached replicate-to-all-devices jit per mesh (a fresh lambda per
    call would miss JAX's function cache and retrace every finalize)."""
    fn = _rep_fns.get(id(mesh))
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn = jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))
        _rep_fns[id(mesh)] = fn
    return fn


class DeviceFS:
    """Device-side mirror of a host Channel from a given state onward.

    Commit phases call :meth:`absorb_root` (with the (8,) u32 root digest
    still on device) and :meth:`draw` (device challenge scalar, usable
    directly in folds/composition) — no host sync.  :meth:`finalize`
    fetches the whole log in ONE transfer, replays the canonical
    transcript into the host channel, and asserts every device-derived
    challenge equals the host derivation.
    """

    def __init__(self, p: int, state_hex: str = "", mesh=None):
        import numpy as np

        self.p = p
        self._mesh = mesh
        if state_hex:
            self.state = jnp.asarray(
                np.frombuffer(bytes.fromhex(state_hex), dtype=">u4").astype(
                    np.uint32
                )
            )
        else:
            self.state = None
        self.log: list[tuple[str, jax.Array]] = []

    def absorb_root(self, digest) -> None:
        """send(root_hex.encode()) — digest: (8,) u32 device array."""
        if self.state is None:
            self.state = jit_absorb_initial()(digest)
        else:
            self.state = jit_absorb()(self.state, digest)
        self.log.append(("root", digest))

    def draw(self) -> jax.Array:
        """receive_random_field_element as a device u32 scalar."""
        if self.state is None:
            raise ValueError("draw before any absorb (empty channel state)")
        v, self.state = jit_draw(self.p)(self.state)
        self.log.append(("draw", v))
        return v

    def mark(self, label: str) -> None:
        """Record a phase boundary; replay emits channel.mark_phase(label)
        at this position (keeps phase-tagged transcripts/checkpoints exact
        when the whole prove replays from one fetch)."""
        self.log.append(("mark", label))

    def payloads(self) -> list:
        """The device arrays the replay needs, in log order (marks carry
        no payload)."""
        return [pl for kind, pl in self.log if kind != "mark"]

    def replay_fetched(self, channel, fetched) -> None:
        """Replay the log into `channel` from already-fetched host values
        (one per non-mark log entry, in order), asserting every device
        draw equals the host derivation."""
        import numpy as np

        from stark_tpu.fields.fp import Fp

        f = Fp.get(self.p)
        it = iter(fetched)
        for kind, payload in self.log:
            if kind == "mark":
                channel.mark_phase(payload)
            elif kind == "root":
                root_hex = np.asarray(next(it)).astype(">u4").tobytes().hex()
                channel.send(root_hex.encode())
            else:
                el = channel.receive_random_field_element()
                dev_val = f.to_ints(np.asarray(next(it)))[0]
                if el.value != dev_val:
                    raise RuntimeError(
                        "device Fiat-Shamir diverged from host transcript "
                        f"({dev_val} != {el.value})"
                    )

    def finalize(self, channel, extras=()) -> list:
        """Replay the log into `channel` (which must be at this FS's
        construction state); returns the fetched `extras` arrays."""
        from stark_tpu.utils.packfetch import device_get_packed

        payloads = self.payloads() + list(extras)
        if self._mesh is not None:
            # multi-process: payloads may span non-addressable devices;
            # replicate the (tiny) values so every host can fetch them
            rep = _replicate_fn(self._mesh)
            payloads = [rep(pl) for pl in payloads]
        fetched = device_get_packed(payloads)
        n = len(payloads) - len(extras)
        self.replay_fetched(channel, fetched[:n])
        return fetched[n:]
