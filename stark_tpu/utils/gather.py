"""Batched device gather — one jit call + ONE device->host transfer for an
arbitrary set of rows from an arbitrary set of device arrays.

Motivation: on this environment's tunneled TPU every device->host fetch
costs ~0.4 s of round-trip latency regardless of size.  A STARK query
opens ~300 values/digests scattered across the trace LDE, every FRI
layer, and every Merkle tree level; fetched row-by-row that is minutes,
batched it is one transfer.  (On local backends this also collapses
hundreds of dispatches into one.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

def _gather_impl(arrays, idx_lists):
    parts = []
    for arr, idxs in zip(arrays, idx_lists):
        parts.append(jnp.take(arr, idxs, axis=0).reshape(-1))
    return jnp.concatenate(parts)


_gather = jax.jit(_gather_impl)
_replicated_gathers: dict = {}


def _gather_for_mesh(mesh):
    """Gather whose (tiny) output is replicated over `mesh` — required in
    multi-process runs, where fetching a shard of a non-addressable
    global array is impossible; replication makes every host able to
    np.asarray the result."""
    fn = _replicated_gathers.get(id(mesh))
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fn = jax.jit(
            _gather_impl, out_shardings=NamedSharding(mesh, P())
        )
        _replicated_gathers[id(mesh)] = fn
    return fn


class BatchGather:
    """Accumulates row requests against a fixed tuple of device arrays,
    executes them as one jitted gather + one host fetch.

    Usage::

        bg = BatchGather((arr_a, arr_b, level0, level1, ...))
        h1 = bg.want(0, idx)          # row of arrays[0]
        h2 = bg.want(3, row)          # row of arrays[3]
        bg.run()
        value = bg.scalar(h1)         # for 1-D arrays: python int
        digest = bg.digest(h2)        # for (n, 8) digest levels: 32 bytes
    """

    def __init__(self, arrays: tuple, mesh=None):
        self.arrays = tuple(arrays)
        self._mesh = mesh
        self._reqs: list[list[int]] = [[] for _ in self.arrays]
        self._handles: list[tuple[int, int]] = []
        self._result: np.ndarray | None = None
        self._offsets: list[int] | None = None

    def want(self, array_i: int, row: int) -> int:
        """Request a row; returns a handle resolved after run()."""
        self._reqs[array_i].append(int(row))
        self._handles.append((array_i, len(self._reqs[array_i]) - 1))
        return len(self._handles) - 1

    def run(self) -> None:
        idx_lists = tuple(
            jnp.asarray(np.asarray(r, dtype=np.int32)) for r in self._reqs
        )
        fn = _gather if self._mesh is None else _gather_for_mesh(self._mesh)
        out = fn(self.arrays, idx_lists)
        self._result = np.asarray(out)  # the ONE transfer
        offs, acc = [], 0
        for arr, reqs in zip(self.arrays, self._reqs):
            offs.append(acc)
            row_elems = int(np.prod(arr.shape[1:], dtype=np.int64)) if arr.ndim > 1 else 1
            acc += len(reqs) * row_elems
        self._offsets = offs

    def _slot(self, handle: int) -> tuple[int, int, int]:
        array_i, pos = self._handles[handle]
        arr = self.arrays[array_i]
        row_elems = int(np.prod(arr.shape[1:], dtype=np.int64)) if arr.ndim > 1 else 1
        start = self._offsets[array_i] + pos * row_elems
        return start, row_elems, array_i

    def scalar(self, handle: int) -> int:
        start, row_elems, _ = self._slot(handle)
        assert row_elems == 1, "scalar() on a multi-element row"
        return int(self._result[start])

    def digest(self, handle: int) -> bytes:
        start, row_elems, _ = self._slot(handle)
        return b"".join(
            int(x).to_bytes(4, "big")
            for x in self._result[start : start + row_elems]
        )
