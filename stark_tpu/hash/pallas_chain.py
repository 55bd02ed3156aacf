"""Pallas sequential SHA-256 chain — the Fiat-Shamir state machine in VMEM.

The device query phase (channel/device_query.py) is a *sequential* chain
of SHA-256 compressions: ~500 blocks per query, every block depending on
the previous one (the transcript format, reference channel.rs:35-84, is
a hash chain — no parallelism exists to exploit).  Expressed as an XLA
``lax.scan`` the chain runs at ~235 us/block on TPU: every scan step
round-trips the tiny carry through HBM and the two inner round-loops add
their own per-iteration overhead.  This kernel runs the whole chain in
one Pallas program — block stream, flags and working state all resident
in VMEM, 64 rounds fully unrolled on (1,1) vregs — at ~2-3 us/block.

Semantics are bit-identical to device_query._block_step (tested in
interpret mode against the XLA scan): each block row carries two flags,
``first`` (start of a message: reset the compressor to H0 and substitute
the chain state's 64-char hex for the block) and ``last`` (message
complete: the compression output becomes the new chain state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.hash.pallas_sha import _extend, _round
from stark_tpu.hash.sha256_jax import _H0, _K

_U32 = jnp.uint32


def _hex_words(cw):
    """(1,1) u32 word -> two (1,1) packed words: the UTF-8 bytes of its
    8 lowercase hex chars, 4 chars per word big-endian (the exact layout
    device_query._hex_rows produces)."""
    ws = []
    for grp in (range(28, 12, -4), range(12, -4, -4)):
        acc = jnp.zeros_like(cw)
        for pos, sh in enumerate(grp):
            nib = (cw >> _U32(sh)) & _U32(0xF)
            ch = jnp.where(nib < _U32(10), _U32(0x30) + nib, _U32(0x57) + nib)
            acc = acc | (ch << _U32(24 - 8 * pos))
        ws.append(acc)
    return ws


def _compress_unrolled(state, w16):
    """64 fully-unrolled rounds on (1,1) vregs (Mosaic compiles this
    fine; it is XLA's graph passes that choke on unrolled SHA)."""
    w = list(w16)
    st = tuple(state)
    for i in range(64):
        if i >= 16:
            w.append(_extend(w, i - 16))
        st = _round(st, w[i], _U32(_K[i]))
    return [s + n for s, n in zip(state, st)]


def _compress_loop(state, w16, kt):
    """Loop form (4 x 16 unrolled rounds) for interpret mode — XLA-CPU
    takes minutes on the fully-unrolled graph.  ``kt``: (4, 16) round
    constants as a kernel input (pallas forbids captured array consts)."""

    def block(it, carry):
        w_arr, st = carry
        ks = jax.lax.dynamic_index_in_dim(kt, it, 0, keepdims=False)
        w = [w_arr[j] for j in range(16)]
        for j in range(16):
            st = _round(st, w[j], ks[j])
            w.append(_extend(w, j))
        return jnp.stack(w[16:]), st

    _, st = jax.lax.fori_loop(0, 4, block, (jnp.stack(w16), tuple(state)))
    return [s + n for s, n in zip(state, st)]


def _make_chain_kernel(n_blocks: int, loop: bool):
    def kern(stream_ref, flags_ref, chain_ref, *refs):
        kt = refs[0][...] if loop else None
        out_ref = refs[-1]
        chain0 = tuple(chain_ref[:, j : j + 1] for j in range(8))
        sha0 = tuple(jnp.zeros((1, 1), _U32) for _ in range(8))

        def body(i, carry):
            sha, chain = carry[:8], carry[8:]
            row = stream_ref[pl.ds(i, 1), :]  # (1, 16)
            fl = flags_ref[pl.ds(i, 1), :]    # (1, 2)
            isf = fl[:, 0:1] != 0
            isl = fl[:, 1:2] != 0
            hexw = []
            for j in range(8):
                hexw += _hex_words(chain[j])
            w = [jnp.where(isf, hexw[j], row[:, j : j + 1])
                 for j in range(16)]
            init = [jnp.where(isf, jnp.full((1, 1), _U32(_H0[j])), sha[j])
                    for j in range(8)]
            if loop:
                out = _compress_loop(init, w, kt)
            else:
                out = _compress_unrolled(init, w)
            nchain = [jnp.where(isl, out[j], chain[j]) for j in range(8)]
            return tuple(out) + tuple(nchain)

        fin = jax.lax.fori_loop(0, n_blocks, body, sha0 + chain0)
        out_ref[...] = jnp.concatenate(fin[8:], axis=1)

    return kern


@functools.lru_cache(maxsize=None)
def _chain_call(n_blocks: int, interpret: bool):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # stream (B, 16)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # flags  (B, 2)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # chain  (1, 8)
    ]
    if interpret:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # kt (4, 16)

    def run(stream, flags, chain):
        args = (stream, flags, chain)
        if interpret:
            args += (jnp.asarray(_K, _U32).reshape(4, 16),)
        return pl.pallas_call(
            _make_chain_kernel(n_blocks, loop=interpret),
            out_shape=jax.ShapeDtypeStruct((1, 8), _U32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)

    return run


def sha_chain(stream, flags, chain, interpret: bool = False):
    """Run the flagged SHA-256 block chain.

    stream: (B, 16) u32 block rows.  flags: (B, 2) u32 [first, last]
    columns.  chain: (8,) u32 initial Fiat-Shamir state.  Returns the
    (8,) final chain state.  Rows whose flags are both 0 after the last
    ``last`` row are inert padding (they perturb only the dead
    compressor state, never the chain).
    """
    b = int(stream.shape[0])
    return _chain_call(b, interpret)(
        stream, flags, chain.reshape(1, 8))[0]
