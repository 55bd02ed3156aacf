"""Packed device->host fetches — one transfer for a pytree of leaves.

The single-fetch prove ends with ONE ``jax.device_get`` of a pytree of
~100 small u32 arrays (FS payloads, query indices, opened values, auth
digests).  On the tunneled TPU each leaf is its own host round trip —
cProfile puts ~105 ms of the ~110 ms warm 2^14 prove inside that fetch
(benches/probe_warmregress_r4.txt), i.e. per-leaf latency, not compute.

``device_get_packed`` concatenates every leaf into one flat u32 buffer
on device (one tiny fused program) and pulls ONE array; the host slices
and reshapes — zero-copy numpy views — and rebuilds the pytree.  Leaves
are bit-identical to a plain ``jax.device_get``.

Fallbacks: non-u32 leaves, tracers, or multi-device-sharded inputs take
the plain path (sharded fetches already replicate first; packing them
would force a second layout pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _concat_jit(num: int):
    def run(flats):
        return jnp.concatenate(flats)

    return jax.jit(run)


def _packable(leaves) -> bool:
    for leaf in leaves:
        if not hasattr(leaf, "dtype") or leaf.dtype != np.uint32:
            return False
        if isinstance(leaf, jax.core.Tracer):
            return False
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None:
            try:
                if len(sharding.device_set) > 1:
                    return False
            except Exception:
                return False
        if leaf.size == 0:
            return False
    return True


def device_get_packed(tree):
    """``jax.device_get`` with one device->host transfer for the whole
    pytree (u32 leaves; falls back to the plain call otherwise)."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves or not _packable(leaves):
        return jax.device_get(tree)
    shapes = [leaf.shape for leaf in leaves]
    sizes = [int(leaf.size) for leaf in leaves]
    packed = _concat_jit(len(leaves))(
        tuple(leaf.reshape(-1) for leaf in leaves))
    flat = np.asarray(packed)  # THE one transfer
    out, pos = [], 0
    for shape, size in zip(shapes, sizes):
        out.append(flat[pos : pos + size].reshape(shape))
        pos += size
    return jax.tree.unflatten(treedef, out)
