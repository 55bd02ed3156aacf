"""Batched SHA-256 on device — pure uint32 jnp, one hash per lane.

The Merkle layer hashes millions of tiny fixed-format messages (8-byte
field values for leaves, reference: src/merkle/mod.rs:11-17; 64-byte
digest pairs for nodes).  Each lane is independent and every operation is
a 32-bit add/rotate/xor — an ideal VPU workload, so the whole batch is a
single fused XLA computation (Pallas variant in stark_tpu.hash.pallas).

Byte semantics are standard FIPS 180-4, identical to hashlib/rs_merkle's
SHA-256; cross-checked against hashlib in tests/test_hash.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_U32 = jnp.uint32

_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]

_H0 = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
       0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]


def _rotr(x, r: int):
    return (x >> _U32(r)) | (x << _U32(32 - r))


def _schedule(w16):
    """Expand 16 message words to all 64 via lax.scan (a 16-row rolling
    window).  Expressed as a loop, not unrolled — a fully unrolled SHA
    graph makes XLA compile time explode superlinearly (measured: minutes
    per jit on this XLA build)."""
    w0 = jnp.stack(w16)  # (16,) + lanes

    def step(window, _):
        x15 = window[1]   # w[i-15]
        x2 = window[14]   # w[i-2]
        s0 = _rotr(x15, 7) ^ _rotr(x15, 18) ^ (x15 >> _U32(3))
        s1 = _rotr(x2, 17) ^ _rotr(x2, 19) ^ (x2 >> _U32(10))
        new = window[0] + s0 + window[9] + s1
        return jnp.concatenate([window[1:], new[None]], axis=0), new

    _, ext = jax.lax.scan(step, w0, None, length=48, unroll=4)
    return jnp.concatenate([w0, ext], axis=0)  # (64,) + lanes


def _compress_fixed(state, w16):
    """One SHA-256 compression (FIPS 180-4).  state: list of 8 arrays;
    w16: list of 16 message-word arrays (big-endian u32).  Batched over
    the lane shape; uint32 adds wrap mod 2^32 natively.  The 64 rounds run
    as a lax.scan to keep the XLA graph compact."""
    w = _schedule(w16)
    k = jnp.asarray(_K, dtype=_U32)

    def round_(carry, xs):
        a, b, c, d, e, f, g, h = carry
        wi, ki = xs
        e1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + e1 + ch + ki + wi
        e0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = e0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g), None

    out, _ = jax.lax.scan(round_, tuple(state), (w, k), unroll=4)
    return [s + n for s, n in zip(state, out)]


def _h0_like(lanes_shape):
    return [jnp.full(lanes_shape, _U32(h)) for h in _H0]


def sha256_u64_leaves(hi, lo):
    """SHA-256 of 8-byte big-endian messages, one per lane.

    hi/lo: uint32 arrays (high/low words of the u64 value).  Returns a
    (lanes, 8) uint32 digest array.  This is exactly the reference's leaf
    hash: Sha256::hash(value.to_be_bytes()) (merkle/mod.rs:14-16).
    """
    shape = hi.shape
    zero = jnp.zeros(shape, _U32)
    w = [hi, lo, jnp.full(shape, _U32(0x80000000))] + [zero] * 12 + [
        jnp.full(shape, _U32(64))
    ]
    out = _compress_fixed(_h0_like(shape), w)
    return jnp.stack(out, axis=-1)


def sha256_row_leaves(cols, wide=None):
    """SHA-256 of multi-column row messages: leaf i hashes the
    concatenation of each column's value as 8-byte big-endian —
    H(col_0[i] || ... || col_{C-1}[i]), cols (C, n) uint32 canonical or
    (C, 2, n) hi/lo limb planes for 64-bit fields.

    The multi-column commitment's leaf rule (the reference defines no
    multi-column layout — its trace/composition are 0-byte stubs); C = 1
    coincides exactly with sha256_u64_leaves.  C <= 6 keeps the message
    in one compression block (8C + 1 + 8 <= 64 bytes).

    `wide` disambiguates a (C, 2, n) limb-plane input from a (C, B, n)
    batched-lane input with B == 2 — pass it explicitly whenever the
    lane shape itself can be (2, n) (stark.batch's batched trees; the
    auto-detection would silently mis-frame the hash and the level loop
    above it never terminates)."""
    C = int(cols.shape[0])
    if not 1 <= C <= 6:
        raise ValueError(f"row leaves support 1..6 columns, got {C}")
    if wide is None:
        wide = cols.ndim == 3 and cols.shape[1] == 2
    shape = cols.shape[2:] if wide else cols.shape[1:]
    zero = jnp.zeros(shape, _U32)
    w = []
    for c in range(C):
        if wide:
            w += [cols[c, 0], cols[c, 1]]  # u64 big-endian: hi, lo limbs
        else:
            w += [zero, cols[c]]  # u64 big-endian: high word 0, low value
    w.append(jnp.full(shape, _U32(0x80000000)))
    w += [zero] * (15 - len(w))
    w.append(jnp.full(shape, _U32(C * 64)))  # bit length of 8C bytes
    out = _compress_fixed(_h0_like(shape), w)
    return jnp.stack(out, axis=-1)


def sha256_pairs(left, right):
    """SHA-256 of 64-byte messages (left||right digests), one per lane.

    left/right: (lanes, 8) uint32 digests.  Two compressions (data block +
    padding block).  This is rs_merkle's parent node hash.
    """
    shape = left.shape[:-1]
    w1 = [left[..., i] for i in range(8)] + [right[..., i] for i in range(8)]
    st = _compress_fixed(_h0_like(shape), w1)
    zero = jnp.zeros(shape, _U32)
    w2 = [jnp.full(shape, _U32(0x80000000))] + [zero] * 14 + [
        jnp.full(shape, _U32(512))
    ]
    out = _compress_fixed(st, w2)
    return jnp.stack(out, axis=-1)


def sha256_bytes_single_block(words16, lanes_shape):
    """Generic single-block compress for pre-padded 16-word messages."""
    return jnp.stack(_compress_fixed(_h0_like(lanes_shape), words16), axis=-1)


@functools.cache
def jit_leaves():
    return jax.jit(sha256_u64_leaves)


@functools.cache
def jit_pairs():
    return jax.jit(sha256_pairs)


def digest_to_bytes(d) -> bytes:
    """(8,) uint32 digest -> 32 bytes big-endian."""
    import numpy as np

    return b"".join(int(x).to_bytes(4, "big") for x in np.asarray(d))


def digests_to_numpy_bytes(level) -> "list[bytes]":
    import numpy as np

    arr = np.asarray(level)
    out = []
    for row in arr:
        out.append(b"".join(int(x).to_bytes(4, "big") for x in row))
    return out
