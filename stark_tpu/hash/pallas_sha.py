"""Pallas SHA-256 kernels — VMEM-resident hashing.

The XLA scan implementation (sha256_jax) round-trips ~24 lane-wide carry
arrays through HBM on every one of its 112 scan steps: hashing 2^22
leaves costs ~40 GB of HBM traffic.  These kernels keep the whole message
schedule + working state in VMEM/registers, reducing traffic to the
protocol minimum (read values once, write digests once): measured ~70x
on tree builds.

Layouts: hash lanes ride the TPU lane dim.  Kernels consume/produce
digests in "plane" form (8, m) (digest word-planes); the tree layer
converts to the (m, 8) row form the Merkle/host code uses with one XLA
transpose per level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.hash.sha256_jax import _H0, _K

_U32 = jnp.uint32
LANES = 128
_ROWS = 256  # hashes per grid step = _ROWS * LANES


def _rotr(x, r: int):
    return (x >> _U32(r)) | (x << _U32(32 - r))


def _round(st, wi, ki):
    """One SHA-256 round on an 8-tuple working state."""
    a, b, c, d, e, f, g, h = st
    e1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
    ch = (e & f) ^ (~e & g)
    t1 = h + e1 + ch + ki + wi
    e0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
    maj = (a & b) ^ (a & c) ^ (b & c)
    t2 = e0 + maj
    return (t1 + t2, a, b, c, d + t1, e, f, g)


def _extend(w, j):
    """Message-schedule extension w[j+16] from a window list."""
    x15, x2 = w[j + 1], w[j + 14]
    s0 = _rotr(x15, 7) ^ _rotr(x15, 18) ^ (x15 >> _U32(3))
    s1 = _rotr(x2, 17) ^ _rotr(x2, 19) ^ (x2 >> _U32(10))
    return w[j] + s0 + w[j + 9] + s1


def _compress_unrolled(state, w16):
    """64 fully-unrolled rounds on vector registers (fine for Mosaic —
    it is XLA's graph passes that choke on unrolled SHA, not Mosaic)."""
    w = list(w16)
    st = tuple(state)
    for i in range(64):
        if i >= 16:
            w.append(_extend(w, i - 16))
        st = _round(st, w[i], _U32(_K[i]))
    return [s + n for s, n in zip(state, st)]


def _compress_loop(state, w16, kt):
    """Same compression as a fori_loop over 4 blocks of 16 unrolled
    rounds — identical math, ~1/4 the traced graph.  XLA-CPU (and hence
    pallas interpret mode) takes >10 min to compile the fully-unrolled
    form; this compiles in seconds.  ``kt``: the round constants as a
    (4, 16) u32 array (kernel input — pallas forbids captured array
    constants)."""

    def block(it, carry):
        w_arr, st = carry
        ks = jax.lax.dynamic_index_in_dim(kt, it, 0, keepdims=False)
        w = [w_arr[j] for j in range(16)]
        for j in range(16):
            st = _round(st, w[j], ks[j])
            w.append(_extend(w, j))  # window for the next block
        return jnp.stack(w[16:]), st

    _, st = jax.lax.fori_loop(0, 4, block, (jnp.stack(w16), tuple(state)))
    return [s + n for s, n in zip(state, st)]


def _compress(state, w16, kt):
    """kt=None -> fully unrolled (Mosaic); else the 4x16 loop form."""
    if kt is None:
        return _compress_unrolled(state, w16)
    return _compress_loop(state, w16, kt)


def _kt():
    return jnp.asarray(_K, _U32).reshape(4, 16)


def _make_leaf_kernel(loop: bool):
    def _leaf_kernel(v_ref, *refs):
        kt = refs[0][:] if loop else None
        o_ref = refs[-1]
        """SHA-256 of 8-byte BE values (high word 0).  v: (R, 128) values;
        o: (8, R, 128) digest planes."""
        lo = v_ref[:]
        shape = lo.shape
        zero = jnp.zeros(shape, _U32)
        w = [zero, lo, jnp.full(shape, _U32(0x80000000))] + [zero] * 12 + [
            jnp.full(shape, _U32(64))
        ]
        out = _compress([jnp.full(shape, _U32(h)) for h in _H0], w, kt)
        for i in range(8):
            o_ref[i] = out[i]

    return _leaf_kernel


def _make_node_kernel(loop: bool):
    def _node_kernel(l_ref, r_ref, *refs):
        kt = refs[0][:] if loop else None
        o_ref = refs[-1]
        """Parent = SHA-256(left||right).  l/r: (8, R, 128) digest planes;
        o: (8, R, 128)."""
        shape = l_ref.shape[1:]
        w1 = [l_ref[i] for i in range(8)] + [r_ref[i] for i in range(8)]
        st = _compress([jnp.full(shape, _U32(h)) for h in _H0], w1, kt)
        zero = jnp.zeros(shape, _U32)
        w2 = [jnp.full(shape, _U32(0x80000000))] + [zero] * 14 + [
            jnp.full(shape, _U32(512))
        ]
        out = _compress(st, w2, kt)
        for i in range(8):
            o_ref[i] = out[i]

    return _node_kernel


@functools.lru_cache(maxsize=None)
def _leaf_call(n: int, interpret: bool):
    rows = n // LANES
    block_rows = min(_ROWS, rows)
    grid = rows // block_rows

    in_specs = [
        pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if interpret:
        in_specs.append(pl.BlockSpec((4, 16), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    def run(values):
        v = values.reshape(rows, LANES)
        args = (v, _kt()) if interpret else (v,)
        planes = pl.pallas_call(
            _make_leaf_kernel(loop=interpret),
            out_shape=jax.ShapeDtypeStruct((8, rows, LANES), _U32),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)
        return planes.reshape(8, n)

    return run


@functools.lru_cache(maxsize=None)
def _node_call(m: int, interpret: bool):
    """m = number of parent nodes (pairs)."""
    rows = m // LANES
    block_rows = min(_ROWS, rows)
    grid = rows // block_rows

    in_specs = [
        pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if interpret:
        in_specs.append(pl.BlockSpec((4, 16), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    def run(left, right):
        l = left.reshape(8, rows, LANES)
        r = right.reshape(8, rows, LANES)
        args = (l, r, _kt()) if interpret else (l, r)
        planes = pl.pallas_call(
            _make_node_kernel(loop=interpret),
            out_shape=jax.ShapeDtypeStruct((8, rows, LANES), _U32),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)
        return planes.reshape(8, m)

    return run


def build_levels_pallas(values, interpret: bool = False):
    """All Merkle levels for a power-of-two leaf count, AoS (m, 8) rows
    (drop-in for merkle.tree._build_jit's output).  Pallas for every level
    with >= 128 nodes; the small top levels use the XLA scan path."""
    from stark_tpu.hash.sha256_jax import sha256_pairs

    n = int(values.shape[0])
    if n & (n - 1) or n < LANES:
        raise ValueError("pallas tree build needs a power-of-two n >= 128")
    planes = _leaf_call(n, interpret)(values)  # (8, n)
    levels = [planes.T]  # AoS view for storage
    size = n
    cur = planes
    while size > 1:
        half = size // 2
        if half >= LANES:
            even = cur[:, 0::2]
            odd = cur[:, 1::2]
            cur = _node_call(half, interpret)(even, odd)
            levels.append(cur.T)
        else:
            aos = cur.T
            lvl = aos
            while lvl.shape[0] > 1:
                lvl = sha256_pairs(lvl[0::2], lvl[1::2])
                levels.append(lvl)
            return tuple(levels)
        size = half
    return tuple(levels)


@functools.lru_cache(maxsize=None)
def build_jit_pallas(n: int, interpret: bool = False):
    return jax.jit(functools.partial(build_levels_pallas, interpret=interpret))
