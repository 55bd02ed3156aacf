"""Compile-cost structure probes (VERDICT r2 #3):

1. one fixed-shape Pallas node call vs FOUR identical calls in one jit
   (does Mosaic dedupe identical kernels within a program?)
2. four DIFFERENT-shaped calls (the non-dedup baseline)
3. parallel compilation: four distinct XLA programs compiled from four
   Python threads vs serially (does the compile service parallelize?)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["STARK_TPU_COMPILE_CACHE"] = f"/tmp/probe_compile_{os.getpid()}"

import jax
import jax.numpy as jnp
import numpy as np

P = 3 * 2**30 + 1


def main():
    from stark_tpu.hash.pallas_sha import _node_call

    C = 1 << 18  # fixed chunk

    def mknode(m):
        call = _node_call(m, False)
        return call

    node = mknode(C)

    planes = jax.jit(lambda: (jnp.arange(8 * C, dtype=jnp.uint32)
                              * jnp.uint32(2654435761)).reshape(8, C))()
    _ = np.asarray(planes[:1, :1])

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

    timed("1x fixed-shape node (compile)", jax.jit(lambda x: node(x, x)),
          planes)

    def four_same(x):
        for _ in range(4):
            x = node(x, x)
        return x

    timed("4x identical node calls, one jit", jax.jit(four_same), planes)

    def four_diff(x):
        out = []
        for k in (15, 16, 17):
            m = 1 << k
            sub = x[:, :m]
            out.append(mknode(m)(sub, sub))
        return out

    timed("3x different-shape node calls, one jit", jax.jit(four_diff),
          planes)

    # parallel XLA compiles: four _layer_jit sizes via threads
    from concurrent.futures import ThreadPoolExecutor

    from stark_tpu.fri.commit import _inv_domain, _layer_jit

    state = jnp.arange(8, dtype=jnp.uint32) + jnp.uint32(7)

    def compile_one(logm):
        m = 1 << logm
        ev = jnp.arange(m, dtype=jnp.uint32) % jnp.uint32(P)
        t0 = time.perf_counter()
        r = _layer_jit(P, m)(state, ev, _inv_domain(P, m, 3))
        jax.block_until_ready(r)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(4) as ex:
        times = list(ex.map(compile_one, [18, 17, 16, 15]))
    wall = time.perf_counter() - t0
    print(f"parallel layer_jit compiles 2^18..2^15: wall {wall:.1f}s, "
          f"individual {[f'{t:.1f}' for t in times]}", flush=True)

    t0 = time.perf_counter()
    for logm in (14, 13, 12, 11):
        compile_one(logm)
    print(f"serial layer_jit compiles 2^14..2^11: wall "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    print("PROBE-COMPILE DONE", flush=True)


if __name__ == "__main__":
    main()
