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

def _gather_impl(lengths, axes, arrays, flat_idx):
    """Slice the packed index vector per array (static offsets), take the
    rows, flatten-concat.  Indices travel as ONE flat int32 upload — on
    the tunneled TPU, uploading hundreds of tiny per-level index arrays
    per query costs far more than the gather itself.

    `axes[i]` is the gather axis for arrays[i]: 0 for row layouts
    ((m, ...) AoS digest levels, 1-D value arrays), 1 for plane-form
    (8, m) bitrev Merkle levels (merkle.tree.MerkleTree.layouts) — an
    axis-1 take transposes so each request's 8 digest words stay
    contiguous in the packed result."""
    parts = []
    off = 0
    for arr, ln, ax in zip(arrays, lengths, axes):
        idxs = jax.lax.slice_in_dim(flat_idx, off, off + ln)
        if ax == 0:
            parts.append(jnp.take(arr, idxs, axis=0).reshape(-1))
        else:
            parts.append(jnp.take(arr, idxs, axis=1).T.reshape(-1))
        off += ln
    return jnp.concatenate(parts)


_gather_fns: dict = {}


def _gather_fn(lengths: tuple, axes: tuple, mesh):
    """Jitted packed gather, cached per (index-counts signature, mesh)."""
    key = (lengths, axes, id(mesh) if mesh is not None else None)
    fn = _gather_fns.get(key)
    if fn is None:
        import functools

        impl = functools.partial(_gather_impl, lengths, axes)
        if mesh is None:
            fn = jax.jit(impl)
        else:
            # multi-process runs: replicate the (tiny) output so every
            # host can fetch it (shards of global arrays are otherwise
            # non-addressable)
            from jax.sharding import NamedSharding, PartitionSpec as P

            fn = jax.jit(impl, out_shardings=NamedSharding(mesh, P()))
        _gather_fns[key] = fn
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

    def __init__(self, arrays: tuple, mesh=None, axes: tuple | None = None):
        self.arrays = tuple(arrays)
        self.axes = tuple(axes) if axes is not None else (0,) * len(self.arrays)
        if len(self.axes) != len(self.arrays):
            raise ValueError("axes must parallel arrays")
        self._mesh = mesh
        self._reqs: list[list[int]] = [[] for _ in self.arrays]
        self._handles: list[tuple[int, int]] = []
        self._result: np.ndarray | None = None
        self._offsets: list[int] | None = None

    def _row_elems(self, arr, axis: int) -> int:
        if arr.ndim <= 1:
            return 1
        total = int(np.prod(arr.shape, dtype=np.int64))
        return total // int(arr.shape[axis])

    def want(self, array_i: int, row: int) -> int:
        """Request a row; returns a handle resolved after run()."""
        self._reqs[array_i].append(int(row))
        self._handles.append((array_i, len(self._reqs[array_i]) - 1))
        return len(self._handles) - 1

    def run(self) -> None:
        lengths = tuple(len(r) for r in self._reqs)
        flat = np.concatenate(
            [np.asarray(r, dtype=np.int32) for r in self._reqs if r]
        ) if any(self._reqs) else np.zeros(0, np.int32)
        fn = _gather_fn(lengths, self.axes, self._mesh)
        out = fn(self.arrays, jnp.asarray(flat))
        self._result = np.asarray(out)  # the ONE transfer
        offs, acc = [], 0
        for arr, reqs, ax in zip(self.arrays, self._reqs, self.axes):
            offs.append(acc)
            acc += len(reqs) * self._row_elems(arr, ax)
        self._offsets = offs

    def _slot(self, handle: int) -> tuple[int, int, int]:
        array_i, pos = self._handles[handle]
        arr = self.arrays[array_i]
        row_elems = self._row_elems(arr, self.axes[array_i])
        start = self._offsets[array_i] + pos * row_elems
        return start, row_elems, array_i

    def scalar(self, handle: int) -> int:
        start, row_elems, _ = self._slot(handle)
        if row_elems != 1:
            raise ValueError("scalar() on a multi-element row")
        return int(self._result[start])

    def value_u64(self, handle: int) -> int:
        """Field element as a host int: 1-element rows are u32 values,
        2-element rows are (hi, lo) limb pairs of 64-bit fields (wide
        arrays enter the gather transposed to (n, 2))."""
        start, row_elems, _ = self._slot(handle)
        if row_elems == 1:
            return int(self._result[start])
        if row_elems == 2:
            return int(self._result[start]) << 32 | int(self._result[start + 1])
        raise ValueError(f"value_u64() on a {row_elems}-element row")

    def digest(self, handle: int) -> bytes:
        start, row_elems, _ = self._slot(handle)
        return b"".join(
            int(x).to_bytes(4, "big")
            for x in self._result[start : start + row_elems]
        )
