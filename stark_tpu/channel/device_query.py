"""Device-resident query phase — the whole decommitment as ONE program.

Round 1 drove the query loop from the host: each query drew its index
from the host channel, ran one batched gather, fetched it, and absorbed
the opened bytes — 2 * num_queries serial host<->device round trips,
because query q+1's index depends on the state after query q's sends
(the protocol is serial; reference: src/fri/fri_commit.rs:168-179).
On the tunneled TPU that round-trip latency dominates the whole prove
(VERDICT r1 missing-item 2: warm prove was flat in trace size).

This module runs the ENTIRE query phase on device in one jit:

  for each query (lax.scan):
    idx   <- state mod (max+1)                 [receive_random_int]
    state <- sha256(utf8(state_hex))
    gather the trace/FRI openings at idx (dynamic slices)
    absorb each opened message into the SHA-256 state machine
      (same double-hex framing as channel.send, see device_channel.py)

and fetches everything — indices, opened values, auth-path digests, the
final state — in ONE transfer.  The host then replays the canonical
transcript (Channel.send / receive_random_int over the fetched bytes)
and asserts the device-derived chain equals the host derivation, so the
emitted proof stays byte-identical to the golden vectors.

The SHA absorption chain is expressed as a lax.scan over a per-query
"block stream": every channel.send hashes utf8(state_hex ++ msg_hex),
whose first 64-byte block is exactly the 64-char state hex (one block),
followed by the message's hex chars and static SHA padding.  Each block
row carries two static flags — `first` (start of a message: reset to H0
and substitute the chain state's hex) and `last` (message complete: the
compression output becomes the new chain state).  One uniform scan body
= one SHA compression, so the program compiles fast regardless of how
many messages a query absorbs.

Index derivation on device: num = int(state_hex, 16) % range
(channel.rs:69-72) for an arbitrary (possibly even) range, computed
without division as sum(bit_k * (2^k mod range)) over the 256 state
bits with overflow-safe modular adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.hash.sha256_jax import _H0, _compress_fixed

_U32 = jnp.uint32
_H0A = np.asarray(_H0, dtype=np.uint32)


# -- hex packing: the shared transcript-critical layout ----------------------
from stark_tpu.channel.device_channel import ascii_hex_words as _hex_rows


def _compress_arr(state8, w16):
    out = _compress_fixed([state8[i] for i in range(8)],
                          [w16[i] for i in range(16)])
    return jnp.stack(out)


def _block_step(carry, xs):
    sha, chain = carry
    row, first, last = xs
    words = jnp.where(first, _hex_rows(chain), row)
    init = jnp.where(first, jnp.asarray(_H0A), sha)
    out = _compress_arr(init, words)
    return (out, jnp.where(last, out, chain)), None


# -- static block-row constants ---------------------------------------------
def _pad_row(msg_bytes: int) -> np.ndarray:
    """The final SHA block when the message (64-byte state prefix + hex
    payload) ends on a block boundary: 0x80, zeros, 64-bit bit length."""
    row = np.zeros(16, dtype=np.uint32)
    row[0] = 0x80000000
    row[15] = msg_bytes * 8
    return row


_CHAIN_ROW = np.zeros(16, dtype=np.uint32)       # placeholder (first=True)


def _value_rows(ncols: int) -> tuple:
    """(full_rows, tail_row) for a value-send payload: a row message of
    `ncols` 8-byte BE values is 16*ncols hex chars = 4*ncols hex words.
    `full_rows` complete 16-word blocks spill first; the remainder plus
    SHA padding ([0x80][zeros][bit length]) fills the tail block.  The
    remainder is always 0/4/8/12 words, so the 9 padding bytes fit."""
    words = 4 * ncols
    full, rem = words // 16, words % 16
    tail = np.zeros(16 - rem, dtype=np.uint32)
    tail[0] = 0x80000000
    tail[-1] = (64 + 16 * ncols) * 8
    return full, tail


_VALUE_TAIL = _value_rows(1)[1]                  # 80-byte message


def _mod_weights(rng: int) -> np.ndarray:
    """(8, 32) table: weight of state word w, bit b is 2^((7-w)*32+b) mod
    rng (state words are big-endian: word 0 is most significant)."""
    return np.array(
        [[pow(2, (7 - w) * 32 + b, rng) for b in range(32)] for w in range(8)],
        dtype=np.uint32,
    )


def _mod_state(chain, weights, rng: int):
    """int(state_hex, 16) mod rng as a u32 scalar (rng < 2^32, any parity)."""
    bits = (chain[:, None] >> jnp.arange(32, dtype=_U32)[None, :]) & _U32(1)
    terms = jnp.where(bits.astype(bool), weights, _U32(0)).reshape(-1)
    m = _U32(rng)

    def addmod(a, b):
        return jnp.where(a >= m - b, a - (m - b), a + b)

    v = terms
    while v.shape[0] > 1:
        v = addmod(v[0::2], v[1::2])
    return v[0]


# -- script ------------------------------------------------------------------
def build_script(num_offsets: int, fri_lengths: tuple) -> list:
    """The per-query message sequence, shared by the device assembly and
    the host replay (order: prover.py trace openings, then
    fri/commit.py's plan_fri_query including the len==1 quirk,
    fri_commit.rs:146-148)."""
    script: list = [("draw",)]
    for t in range(num_offsets):
        script.append(("value", ("trace_v", t)))
        script.append(("path", ("trace_p", t)))
    for l, ln in enumerate(fri_lengths):
        if ln == 1:
            script.append(("value", ("fri_q", l)))
        for which in (0, 1):
            script.append(("value", ("fri_v", l, which)))
            script.append(("path", ("fri_p", l, which)))
    return script


def _log2(n: int) -> int:
    return n.bit_length() - 1


def _rev_u32(x):
    """Bit-reverse a u32 scalar (5 masked swaps); callers shift right by
    (32 - k) for a k-bit reversal — maps node index -> storage column of
    a bitrev-layout Merkle level (merkle.tree.MerkleTree.layouts)."""
    x = ((x & _U32(0x55555555)) << _U32(1)) | ((x >> _U32(1)) & _U32(0x55555555))
    x = ((x & _U32(0x33333333)) << _U32(2)) | ((x >> _U32(2)) & _U32(0x33333333))
    x = ((x & _U32(0x0F0F0F0F)) << _U32(4)) | ((x >> _U32(4)) & _U32(0x0F0F0F0F))
    x = ((x & _U32(0x00FF00FF)) << _U32(8)) | ((x >> _U32(8)) & _U32(0x00FF00FF))
    return (x << _U32(16)) | (x >> _U32(16))


class DeviceQueryPlan:
    """Jitted full query phase for one static configuration.

    Static key: field modulus is irrelevant here (pure SHA + index
    arithmetic); what matters is the draw range, query count, trace
    offsets, trace domain size, and the FRI layer-size ladder.  All
    sizes must be powers of two (always true for the prover's eval
    domains; the generic odd-size MerkleTree keeps the host path).
    """

    def __init__(self, rng: int, num_queries: int, offsets: tuple,
                 trace_len: int | None, fri_lengths: tuple,
                 elem_width: int = 1, num_columns: int = 1,
                 trace_prev: int = 0, fri_prev: tuple = (),
                 trace_prune: int = 0, fri_prune: tuple = ()):
        if rng <= 0 or rng >= 1 << 32:
            raise ValueError(f"draw range {rng} not in [1, 2^32)")
        if elem_width not in (1, 2):
            raise ValueError(f"elem_width must be 1 or 2, got {elem_width}")
        if not 1 <= num_columns <= 6:
            raise ValueError(
                "device query phase supports 1..6 trace columns (the "
                "row-leaf commitment's one-block limit, sha256_row_leaves)")
        for ln in (fri_lengths + ((trace_len,) if trace_len else ())):
            if ln & (ln - 1):
                raise ValueError("device query phase needs power-of-two sizes")
        self.rng = rng
        self.num_queries = num_queries
        self.offsets = tuple(int(o) for o in offsets)
        self.trace_len = trace_len
        self.elem_width = elem_width
        self.num_columns = num_columns
        self.fri_lengths = tuple(int(x) for x in fri_lengths)
        # leading bitrev-plane level counts (MerkleTree.prev_depth): 0 for
        # pure-AoS trees; fri_prev is per FRI tree (empty -> all AoS)
        self.trace_prev = int(trace_prev)
        self.fri_prev = tuple(int(x) for x in fri_prev) if fri_prev else (
            (0,) * len(self.fri_lengths))
        # pruned-storage depths (merkle.tree.prune_depth_for): the first
        # `prune` levels of a tree are NOT stored; their path siblings
        # are recomputed here from the leaf VALUES (aligned 2^prune
        # block hashed up inside the scan, _subtree_sibs)
        self.trace_prune = int(trace_prune)
        self.fri_prune = tuple(int(x) for x in fri_prune) if fri_prune else (
            (0,) * len(self.fri_lengths))
        self.script = build_script(len(self.offsets), self.fri_lengths)
        self._weights = jnp.asarray(_mod_weights(rng))

        # static flag/constant rows for the block stream
        first_f, last_f, const_rows = [], [], []

        def msg(n_payload_rows: int, tail_row):
            first_f.extend([True] + [False] * (n_payload_rows + 1))
            last_f.extend([False] * (n_payload_rows + 1) + [True])
            const_rows.append(tail_row)

        self._vrow_full, self._vrow_tail = _value_rows(self.num_columns)
        for op in self.script:
            if op[0] == "draw":
                msg(0, _pad_row(64))
            elif op[0] == "value":
                # trace row messages of >3 columns spill full hex blocks
                # before the padded tail; single values stay one block
                full = (self._vrow_full
                        if op[1][0] == "trace_v" and self.num_columns > 1
                        else 0)
                msg(full, None)  # dynamic row(s)
            else:  # path
                h = self._height(op[1])
                msg(h, _pad_row(64 + 64 * h))
        self._first = jnp.asarray(np.array(first_f))
        self._last = jnp.asarray(np.array(last_f))
        self._flags = jnp.asarray(
            np.stack([first_f, last_f], axis=1).astype(np.uint32))
        self._jit_cache: dict = {}

    def _height(self, src) -> int:
        if src[0] == "trace_p":
            return _log2(self.trace_len)
        return _log2(self.fri_lengths[src[1]])

    # -- device program ---------------------------------------------------
    def _subtree_sibs(self, values, j, prune: int, columns: bool):
        """Path siblings for the `prune` UNSTORED levels, recomputed from
        the leaf values: dynamic-slice the aligned 2^prune-leaf block at
        (j >> prune) << prune, hash it up level by level, picking the
        in-block sibling at each.  Returns a list of `prune` (8,) digest
        rows (leaf level first).  `values` layouts mirror the tree
        builds: (n,) u32 / (2, n) limb planes / (C, n) / (C, 2, n)."""
        from stark_tpu.hash.sha256_jax import (sha256_pairs,
                                               sha256_row_leaves,
                                               sha256_u64_leaves)

        blk = 1 << prune
        base = (j >> _U32(prune)) << _U32(prune)
        zero = jnp.zeros((), _U32)
        wide = self.elem_width == 2
        if columns and self.num_columns > 1:
            if wide:  # (C, 2, n)
                v = jax.lax.dynamic_slice(
                    values, (zero, zero, base), (self.num_columns, 2, blk))
            else:  # (C, n)
                v = jax.lax.dynamic_slice(
                    values, (zero, base), (self.num_columns, blk))
            leafs = sha256_row_leaves(v, wide=wide)  # (blk, 8)
        elif wide:  # (2, n) limb planes
            v = jax.lax.dynamic_slice(values, (zero, base), (2, blk))
            leafs = sha256_u64_leaves(v[0], v[1])
        else:  # (n,)
            v = jax.lax.dynamic_slice(values, (base,), (blk,))
            leafs = sha256_u64_leaves(jnp.zeros_like(v), v)
        joff = j & _U32(blk - 1)
        rows, cur = [], leafs
        for li in range(prune):
            r = (joff >> _U32(li)) ^ _U32(1)
            rows.append(jnp.take(cur, r, axis=0))
            cur = sha256_pairs(cur[0::2], cur[1::2])
        return rows

    def _gather_path(self, flat_levels, j, h: int, prev: int, n: int,
                     prune: int = 0, values=None, columns: bool = False):
        """Sibling digests for leaf j of a power-of-two tree: (h, 8).

        `flat_levels` are the STORED digest levels FLATTENED to 1-D (see
        _run) — levels `prune` .. h-1 of the tree; the first `prune`
        levels' siblings are recomputed from `values` (_subtree_sibs).
        Of the stored levels, the first `prev` are bitrev-plane (8, m)
        storage (merkle.tree layouts) — sibling node v = (j >> li) ^ 1
        lives at flat position w*m + rev_{h-li}(v) for word w; the rest
        are (m, 8) AoS rows at node*8 + w.  Gathering 2-D levels
        directly makes XLA copy each whole level into a transposed
        T(8,128) temp inside the query scan — a 16x pad of the 8-word
        axis that OOMed the 2^22 prove at 47.8 GB (probe_bigtrace r4);
        1-D gathers give the compiler no layout choice."""
        if h == 0:
            return jnp.zeros((0, 8), _U32)
        rows = (self._subtree_sibs(values, j, prune, columns)
                if prune else [])
        w8 = jnp.arange(8, dtype=_U32)
        for li in range(prune, h):
            m = n >> li  # nodes at level li
            node = (j >> _U32(li)) ^ _U32(1)
            si = li - prune  # stored-level index
            if si < prev:
                srow = _rev_u32(node) >> _U32(32 - (h - li))
                rows.append(flat_levels[si][srow + _U32(m) * w8])
            else:
                rows.append(jax.lax.dynamic_slice(
                    flat_levels[si], (node * _U32(8),), (8,)))
        return jnp.stack(rows)

    def _run(self, state, f_evals, trace_levels, fri_layers, fri_levels,
             mode: int = 0):
        """mode: 0 = XLA block scan, 1 = Pallas chain kernel (TPU),
        2 = Pallas interpret (CI).  The SHA chain is strictly sequential
        (~500 blocks/query); the Pallas kernel runs it VMEM-resident at
        ~2-3 us/block where the XLA scan pays ~235 us/block in carry
        round-trips (hash/pallas_chain.py)."""
        offsets = self.offsets
        half = [ln // 2 for ln in self.fri_lengths]
        # flatten every digest level ONCE (outside the scan): bitrev
        # (8, m) planes flatten to a bitcast; AoS (m, 8) levels pay at
        # most one linear copy.  See _gather_path for why.
        trace_flat = tuple(lv.reshape(-1) for lv in trace_levels)
        fri_flat = tuple(tuple(lv.reshape(-1) for lv in lvl)
                         for lvl in fri_levels)

        def qbody(chain, _):
            idx = _mod_state(chain, self._weights, self.rng)
            rows: list = []
            outs: list = []
            for op in self.script:
                rows.append(jnp.asarray(_CHAIN_ROW)[None])
                if op[0] == "draw":
                    rows.append(jnp.asarray(_pad_row(64))[None])
                    continue
                src = op[1]
                if op[0] == "value":
                    if src[0] == "trace_v":
                        v = f_evals[..., idx + _U32(offsets[src[1]])]
                    elif src[0] == "fri_q":
                        v = fri_layers[src[1]][..., 0]
                    else:  # fri_v
                        l, which = src[1], src[2]
                        j = idx & _U32(self.fri_lengths[l] - 1)
                        if which:
                            j = j ^ _U32(half[l])
                        v = fri_layers[l][..., j]
                    outs.append(v)
                    if src[0] == "trace_v" and self.num_columns > 1:
                        # row message: each column as u64 BE — (C,) u32
                        # pads a zero high word; (C, 2) limb pairs are
                        # already (hi, lo)
                        if self.elem_width == 2:
                            words = v.reshape(-1)
                        else:
                            words = jnp.stack(
                                [jnp.zeros_like(v), v], axis=-1).reshape(-1)
                        hv = _hex_rows(words)
                        blk = jnp.concatenate(
                            [hv, jnp.asarray(self._vrow_tail)])
                        rows.append(blk.reshape(self._vrow_full + 1, 16))
                    else:
                        # 16 hex chars of the 8-byte BE value
                        words = v if self.elem_width == 2 else jnp.stack(
                            [jnp.zeros((), _U32), v])
                        hv = _hex_rows(words)
                        rows.append(
                            jnp.concatenate([hv,
                                             jnp.asarray(_VALUE_TAIL)])[None])
                else:  # path
                    if src[0] == "trace_p":
                        j = idx + _U32(offsets[src[1]])
                        h = _log2(self.trace_len)
                        digs = self._gather_path(
                            trace_flat, j, h, self.trace_prev,
                            self.trace_len, self.trace_prune, f_evals,
                            columns=True)
                    else:
                        l, which = src[1], src[2]
                        h = _log2(self.fri_lengths[l])
                        j = idx & _U32(self.fri_lengths[l] - 1)
                        if which:
                            j = j ^ _U32(half[l])
                        digs = self._gather_path(fri_flat[l], j, h,
                                                 self.fri_prev[l],
                                                 self.fri_lengths[l],
                                                 self.fri_prune[l],
                                                 fri_layers[l])
                    outs.append(digs)
                    if h:
                        rows.append(_hex_rows(digs))
                    rows.append(jnp.asarray(_pad_row(64 + 64 * h))[None])
            stream = jnp.concatenate(rows, axis=0)
            if mode:
                from stark_tpu.hash.pallas_chain import sha_chain

                chain2 = sha_chain(stream, self._flags, chain,
                                   interpret=(mode == 2))
            else:
                (sha, chain2), _ = jax.lax.scan(
                    _block_step,
                    (jnp.zeros(8, _U32), chain),
                    (stream, self._first, self._last),
                )
                del sha
            return chain2, (idx, tuple(outs))

        final_state, per_query = jax.lax.scan(
            qbody, state, None, length=self.num_queries)
        return final_state, per_query

    # -- host driver -------------------------------------------------------
    def _mode(self, probe) -> int:
        import os

        if (os.environ.get("STARK_TPU_XLA_CHAIN")
                or os.environ.get("STARK_TPU_NO_PALLAS")):
            return 0
        try:
            on_tpu = next(iter(probe.devices())).platform == "tpu"
        except Exception:
            on_tpu = False
        return 1 if on_tpu else 0

    def run_device(self, state, f_evals, trace_levels, fri_layers,
                   fri_levels, mode: int | None = None):
        """Dispatch the device program only (no fetch): `state` is the
        (8,) u32 Fiat-Shamir state array; returns device
        (final_state, idxs, outs) for a later fetch + :meth:`replay`."""
        if mode is None:
            probe = f_evals if f_evals is not None else (
                fri_layers[0] if fri_layers else None)
            mode = self._mode(probe)
        fn = self._jit_cache.get(mode)
        if fn is None:
            from stark_tpu.utils.progcache import cached_jit

            fn = cached_jit(
                functools.partial(self._run, mode=mode), "query-phase",
                (self.rng, self.num_queries, self.offsets, self.trace_len,
                 self.fri_lengths, self.elem_width, self.num_columns,
                 self.trace_prev, self.fri_prev, self.trace_prune,
                 self.fri_prune, mode))
            self._jit_cache[mode] = fn
        final_state, (idxs, outs) = fn(
            state, f_evals, tuple(trace_levels),
            tuple(fri_layers), tuple(tuple(l) for l in fri_levels))
        return final_state, idxs, outs

    def run(self, channel, f_evals, trace_levels, fri_layers, fri_levels,
            mode: int | None = None):
        """Execute on device, fetch once, replay the canonical transcript
        into `channel`, asserting the device chain matches."""
        if not channel.state:
            from stark_tpu.channel.channel import ChannelError

            raise ChannelError(
                "query phase before any send (empty channel state)")
        state = jnp.asarray(
            np.frombuffer(bytes.fromhex(channel.state), dtype=">u4").astype(
                np.uint32))
        from stark_tpu.utils.packfetch import device_get_packed

        dev = self.run_device(state, f_evals, trace_levels, fri_layers,
                              fri_levels, mode)
        final_h, idxs_h, outs_h = device_get_packed(dev)
        self.replay(channel, final_h, idxs_h, outs_h)

    def replay(self, channel, final_h, idxs_h, outs_h):
        """Replay the canonical transcript into `channel` from fetched
        host values, asserting the device chain matches."""
        for q in range(self.num_queries):
            idx = channel.receive_random_int(0, self.rng - 1, True)
            if idx != int(idxs_h[q]):
                raise RuntimeError(
                    "device query Fiat-Shamir diverged from host transcript "
                    f"(query {q}: device idx {int(idxs_h[q])} != host {idx})")
            cursor = 0
            for op in self.script:
                if op[0] == "draw":
                    continue
                data = outs_h[cursor][q]
                cursor += 1
                if op[0] == "value":
                    src = op[1]
                    if src[0] == "trace_v" and self.num_columns > 1:
                        arr = np.asarray(data).reshape(-1)
                        if self.elem_width == 2:
                            # (C, 2) hi/lo pairs -> C 8-byte BE values
                            channel.send(np.ascontiguousarray(
                                arr.astype(np.uint32)).astype(
                                    ">u4").tobytes())
                        else:
                            channel.send(b"".join(
                                int(x).to_bytes(8, "big") for x in arr))
                        continue
                    if self.elem_width == 2:
                        val = int(data[0]) << 32 | int(data[1])
                    else:
                        val = int(data)
                    channel.send(val.to_bytes(8, "big"))
                else:
                    channel.send(
                        np.ascontiguousarray(
                            data.astype(np.uint32)).astype(">u4").tobytes())

        final_hex = np.ascontiguousarray(
            final_h.astype(np.uint32)).astype(">u4").tobytes().hex()
        if channel.state != final_hex:
            raise RuntimeError(
                "device query Fiat-Shamir final state diverged from the "
                "host replay — transcript would not verify")


@functools.lru_cache(maxsize=None)
def get_plan(rng: int, num_queries: int, offsets: tuple,
             trace_len: int | None, fri_lengths: tuple,
             elem_width: int = 1, num_columns: int = 1,
             trace_prev: int = 0, fri_prev: tuple = (),
             trace_prune: int = 0, fri_prune: tuple = ()) -> DeviceQueryPlan:
    return DeviceQueryPlan(rng, num_queries, offsets, trace_len, fri_lengths,
                           elem_width, num_columns, trace_prev, fri_prev,
                           trace_prune, fri_prune)


def supported(rng: int, trace_len: int | None, fri_lengths,
              num_columns: int = 1, elem_width: int = 1) -> bool:
    """Whether the device path handles this configuration (power-of-two
    sizes, draw range below 2^32, <= 6 trace columns over either field
    width) — mirrors the DeviceQueryPlan constructor checks so callers
    degrade to the host query loop instead of crashing mid-prove."""
    if not 0 < rng < 1 << 32 or not 1 <= num_columns <= 6:
        return False
    if elem_width not in (1, 2):
        return False
    sizes = list(fri_lengths) + ([trace_len] if trace_len else [])
    return all(s > 0 and not (s & (s - 1)) for s in sizes)
