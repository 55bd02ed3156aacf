"""Where do the 108 ms of a 2^22-leaf Merkle build go?

VERDICT r2 #2: 38.8 M leaves/s is ~10x below a VPU-compute roofline
(~12.6 M SHA compressions x ~3k ops @ 3.8 Tops/s ~= 10 ms).  This probe
times each piece of hash/pallas_sha.build_levels_pallas on hardware:

  1. the leaf kernel alone (2^22 single-block compressions)
  2. one node kernel alone at 2^21 parents (double-block compressions)
  3. the XLA even/odd lane deinterleave alone
  4. the full tree build (reference number)

Timing = chained in-jit fori_loop (bench.chain_time semantics: the
tunnel's block_until_ready does not await, so sync via 4-byte fetch).
"""
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 3 * 2**30 + 1
N = 1 << 22


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


def main():
    from stark_tpu.hash.pallas_sha import _leaf_call, _node_call, build_jit_pallas

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    @jax.jit
    def gen(salt):
        i = jnp.arange(N, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        return (x ^ (x >> jnp.uint32(13))) % jnp.uint32(P)

    values = gen(jnp.uint32(1))
    _ = np.asarray(values[:1])

    # 1. leaf kernel alone: (N,) values -> (8, N) planes
    leaf = _leaf_call(N, False)

    def leaf_step(v):
        return leaf(v)[1]  # (N,) plane keeps shape for chaining

    t0 = time.time()
    t = chain_time(leaf_step, values, iters=8)
    print(f"leaf kernel 2^22 (compile {time.time()-t0:.1f}s): {t*1e3:.2f} ms "
          f"({N/t/1e6:.1f} M compressions/s)", flush=True)

    # 2. node kernel alone at 2^21 parents
    M = N // 2
    node = _node_call(M, False)
    planes = jax.jit(lambda v: jnp.broadcast_to(v[:M], (8, M)) ^ jnp.arange(8, dtype=jnp.uint32)[:, None])(values)
    _ = np.asarray(planes[:1, :1])

    def node_step(pl):
        return node(pl, pl)

    t0 = time.time()
    t = chain_time(node_step, planes, iters=8)
    print(f"node kernel 2^21 (compile {time.time()-t0:.1f}s): {t*1e3:.2f} ms "
          f"({M/t/1e6:.1f} M dbl-compressions/s)", flush=True)

    # 3. even/odd lane deinterleave alone (the XLA glue between levels)
    def deint_step(pl):
        even = pl[:, 0::2]
        odd = pl[:, 1::2]
        return jnp.concatenate([odd, even], axis=1)

    t = chain_time(deint_step, planes, iters=16)
    print(f"even/odd deinterleave (8, 2^21): {t*1e3:.2f} ms", flush=True)

    # 4. full tree
    build = build_jit_pallas(N)

    def tree_step(v):
        levels = build(v)
        return v ^ levels[-1][0, 0]

    t0 = time.time()
    t = chain_time(tree_step, values, iters=4)
    print(f"full tree 2^22 (compile {time.time()-t0:.1f}s): {t*1e3:.2f} ms "
          f"({N/t/1e6:.1f} M leaves/s)", flush=True)
    print("PROBE-MERKLE DONE", flush=True)


if __name__ == "__main__":
    main()
