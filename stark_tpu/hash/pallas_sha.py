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


def _make_leaf_kernel(loop: bool, wide: bool = False):
    def _leaf_kernel(v_ref, *refs):
        kt = refs[0][:] if loop else None
        o_ref = refs[-1]
        """SHA-256 of 8-byte BE values.  v: (R, 128) u32 values (high word
        0), or (2, R, 128) limb-pair planes for 64-bit fields;
        o: (8, R, 128) digest planes."""
        if wide:
            hi, lo = v_ref[0], v_ref[1]
        else:
            lo = v_ref[:]
            hi = jnp.zeros(lo.shape, _U32)
        shape = lo.shape
        zero = jnp.zeros(shape, _U32)
        w = [hi, lo, jnp.full(shape, _U32(0x80000000))] + [zero] * 12 + [
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
def _leaf_call(n: int, interpret: bool, wide: bool = False):
    rows = n // LANES
    block_rows = min(_ROWS, rows)
    grid = rows // block_rows

    if wide:
        in_specs = [
            pl.BlockSpec((2, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    if interpret:
        in_specs.append(pl.BlockSpec((4, 16), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    def run(values):
        v = values.reshape((2, rows, LANES) if wide else (rows, LANES))
        args = (v, _kt()) if interpret else (v,)
        planes = pl.pallas_call(
            _make_leaf_kernel(loop=interpret, wide=wide),
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


# -- bitrev tree build --------------------------------------------------------
# The r2 build paired siblings with an even/odd LANE deinterleave plus an
# (8, m).T per level — XLA relayouts measured at 13.1 / 2.0 ms per level
# at 2^21 (benches/probe_relayout_r3.txt) while the SHA kernels themselves
# run at 7.9 ms per 2^21 nodes; ~80 of the tree's 108 ms was glue.
#
# Fix: store each big level in BIT-REVERSED node order, plane form (8, m).
# With nodes at storage position rev_k(v), the children of parent j sit at
# the SAME position in the two contiguous halves of the child level
# (rev_k(2j) = rev_{k-1}(j), rev_k(2j+1) = rev_{k-1}(j) + m), so every
# node kernel reads two contiguous half-slices of the previous level and
# writes parents in place — ZERO relayout ops between levels.  The one
# permutation is a 3-pass bit-reversal of the leaf VALUES (row-gather +
# transpose + row-gather, ~2.9 ms at 2^22).  Consumers map node index ->
# storage position (merkle.tree layout machinery / device_query._rev_bits).


@functools.lru_cache(maxsize=None)
def _bitrev_host(l: int):
    import numpy as np

    bits = l.bit_length() - 1
    idx = np.arange(l, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _bitrev_vals_jit(n: int, wide: bool):
    """values (n,) (or (2, n)) -> bit-reversed order along the last axis,
    via the bandwidth-friendly 3-pass decomposition
    rev_n(i1*n2 + i2) = rev_n2(i2)*n1 + rev_n1(i1)."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    # keep the index tables as NUMPY in the closure: jnp.asarray here
    # would bind a tracer if this cache entry is first built while an
    # outer trace is live (e.g. prewarm tracing a fused FRI layer) and
    # every later use would raise UnexpectedTracerError
    rev1 = _bitrev_host(n1)
    rev2 = _bitrev_host(n2)

    def run(values):
        lead = values.shape[:-1]
        a = values.reshape(lead + (n1, n2))
        a = jnp.take(a, rev1, axis=-2)
        a = jnp.swapaxes(a, -1, -2)
        a = jnp.take(a, rev2, axis=-2)
        return a.reshape(lead + (n,))

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _node_call_halves(m: int, interpret: bool):
    """m parents from a (8, 2m) bitrev-ordered child level: left children
    are the first half, right children the second — the same HBM array
    enters twice with different block index maps, so pairing costs no
    relayout at all."""
    rows = m // LANES
    block_rows = min(_ROWS, rows)
    grid = rows // block_rows

    in_specs = [
        pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i + grid, 0),
                     memory_space=pltpu.VMEM),
    ]
    if interpret:
        in_specs.append(pl.BlockSpec((4, 16), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    def run(level):
        v = level.reshape(8, 2 * rows, LANES)
        args = (v, v, _kt()) if interpret else (v, v)
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

    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(run, "sha-node-halves", (m, interpret))


@functools.lru_cache(maxsize=None)
def _leaf_jit(n: int, interpret: bool, wide: bool):
    leaf = _leaf_call(n, interpret, wide)
    rev = _bitrev_vals_jit(n, wide)
    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(lambda values: leaf(rev(values)), "sha-leaves",
                      (n, interpret, wide))


# Smallest level a Pallas node kernel handles: Mosaic requires the block's
# sublane dim divisible by 8, so the plane view (8, m/128, 128) needs
# m >= 8 * 128.  Levels at/below convert to natural AoS once (tiny) and
# ride the XLA tail scan (which collapses them into ONE lax.scan).
_PALLAS_TAIL = 8 * LANES


@functools.lru_cache(maxsize=None)
def _tail_jit(size: int):
    """(8, size) bitrev planes -> natural-order AoS tail levels
    [(size/2, 8), ..., (1, 8)] via one conversion + the XLA scan."""
    from stark_tpu.merkle.tree import _tail_scan

    rev = _bitrev_host(size)  # numpy on purpose — see _bitrev_vals_jit
    k = size.bit_length() - 1

    def run(planes):
        aos = jnp.take(planes.T, rev, axis=0)  # natural order, (size, 8)
        return tuple(_tail_scan(aos, k))

    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(run, "sha-tail", (size,))


def bitrev_prev_depth(n: int) -> int:
    """How many levels (from the leaves) a size-n bitrev tree stores in
    plane-bitrev form; the rest are natural AoS (static in n)."""
    depth = 1  # leaf-digest level
    size = n
    while size // 2 >= _PALLAS_TAIL:
        depth += 1
        size //= 2
    return depth


def build_tree_bitrev(values, interpret: bool = False, prune: int = 0):
    """All Merkle digest levels for a power-of-two leaf count.  Big levels
    come back plane-form (8, m) in BIT-REVERSED node order (layout 'prev'),
    the tail natural AoS (m, 8) — see merkle.tree.MerkleTree.layouts.

    `values`: (n,) canonical u32, or (2, n) limb pairs for 64-bit fields
    (leaf preimage = 8-byte BE of the full value either way).

    Dispatched as one cached jit per LEVEL size — a tree of size n/2
    reuses every kernel a size-n tree already compiled except its own
    leaf kernel, so a FRI ladder pays each Mosaic compile once.

    With `prune`, the first `prune` levels are built transiently and
    dropped (pruned storage, merkle.tree.prune_depth_for): each big
    level's buffer frees as soon as its parent level is built, so the
    peak live set is two adjacent levels instead of the whole tree.
    """
    wide = values.ndim == 2
    n = int(values.shape[-1])
    if n & (n - 1) or n < LANES:
        raise ValueError("bitrev tree build needs a power-of-two n >= 128")
    cur = _leaf_jit(n, interpret, wide)(values)
    levels = [] if prune > 0 else [cur]
    size = n
    depth = 1
    while size // 2 >= _PALLAS_TAIL:
        size //= 2
        cur = _node_call_halves(size, interpret)(cur)
        if depth >= prune:
            levels.append(cur)
        depth += 1
    if size > 1:
        tail = _tail_jit(size)(cur)
        levels.extend(tail[max(0, prune - depth):])
    return tuple(levels)
