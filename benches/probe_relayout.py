"""Cost of the candidate layout ops for the Merkle rebuild (VERDICT r2 #2).

The tree build's SHA kernels run at ~1.75 Tops/s but the XLA glue between
levels (even/odd lane deinterleave + per-level (8,m).T) eats ~80 of the
108 ms.  Candidates to replace them, timed at 2^21/2^22 on hardware:

  a. (8, m) -> (m, 8) transpose                  (today's per-level .T)
  b. lane deinterleave x[:, 0::2]                 (today's pairing)
  c. flat bitrev permutation of (n,) values via the 3-pass row-gather
     decomposition (rev rows -> T -> rev rows)    (proposed: once per tree)
  d. 32-byte row gather: take((m, 8), rev, axis=0) (AoS un-reverse)
  e. plane un-reverse: (8, m) -> 3-pass along axis 1, keeping planes
  f. concat halves [x[:, :m/2], x[:, m/2:]]       (contiguous: the new pairing)
"""
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 22
M = 1 << 21


def chain_time(step, x0, iters=8, reps=3):
    @jax.jit
    def chained(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: step(v), x)

    r = chained(x0)
    _ = np.asarray(r.reshape(-1)[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = chained(x0)
        _ = np.asarray(r.reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / iters


def _bitrev(l):
    bits = l.bit_length() - 1
    idx = np.arange(l, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n):
        i = jnp.arange(n, dtype=jnp.uint32)
        return i * jnp.uint32(2654435761)

    planes = jax.jit(lambda: gen(8 * M).reshape(8, M))()
    _ = np.asarray(planes[:1, :1])

    # a. transpose (shape round-trips via second transpose for chaining)
    t = chain_time(lambda x: (x.T + jnp.uint32(1)).T, planes, iters=8)
    print(f"a. (8,2^21).T round-trip: {t*1e3:.2f} ms (half = one .T)", flush=True)

    # b. lane deinterleave
    t = chain_time(
        lambda x: jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=1), planes,
        iters=8)
    print(f"b. lane deinterleave (8,2^21): {t*1e3:.2f} ms", flush=True)

    # c. flat bitrev of (2^22,) values, 3-pass
    n1 = 1 << 11
    n2 = N // n1
    rev1 = jnp.asarray(_bitrev(n1))
    rev2 = jnp.asarray(_bitrev(n2))
    vals = gen(N)
    _ = np.asarray(vals[:1])

    def bitrev3(x):
        a = jnp.take(x.reshape(n1, n2), rev1, axis=0)
        b = jnp.take(a.T, rev2, axis=0)
        return b.reshape(N)

    t = chain_time(bitrev3, vals, iters=8)
    print(f"c. flat bitrev 2^22 (3-pass): {t*1e3:.2f} ms", flush=True)

    # d. 32-byte row gather on (2^21, 8)
    aos = jax.jit(lambda: gen(8 * M).reshape(M, 8))()
    _ = np.asarray(aos[:1, :1])
    revm = jnp.asarray(_bitrev(M))
    t = chain_time(lambda x: jnp.take(x, revm, axis=0), aos, iters=4)
    print(f"d. (2^21,8) row gather: {t*1e3:.2f} ms", flush=True)

    # e. plane un-reverse: (8, 2^21) permute lanes via 3-pass
    m1 = 1 << 10
    m2 = M // m1
    r1 = jnp.asarray(_bitrev(m1))
    r2 = jnp.asarray(_bitrev(m2))

    def plane_unrev(x):
        a = jnp.take(x.reshape(8, m1, m2), r1, axis=1)
        b = jnp.take(jnp.swapaxes(a, 1, 2), r2, axis=1)
        return b.reshape(8, M)

    t = chain_time(plane_unrev, planes, iters=8)
    print(f"e. plane un-reverse (8,2^21) 3-pass: {t*1e3:.2f} ms", flush=True)

    # f. contiguous halves concat (the new pairing pattern)
    t = chain_time(
        lambda x: jnp.concatenate([x[:, M // 2:], x[:, : M // 2]], axis=1),
        planes, iters=16)
    print(f"f. halves concat (8,2^21): {t*1e3:.2f} ms", flush=True)
    print("PROBE-RELAYOUT DONE", flush=True)


if __name__ == "__main__":
    main()
