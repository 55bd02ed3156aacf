"""Round-2 probe E: does this backend compile DIFFERENT programs in
parallel?  Lowers N distinct Merkle-tree-build programs (the cold-cliff
workload) and compiles them serially vs on a thread pool.

If parallel wins ~Nx, an AOT precompile pass can hide the cold cliff.
"""
import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fresh cache so every compile is real
os.environ["STARK_TPU_COMPILE_CACHE"] = f"/tmp/parc_{os.getpid()}"

import jax
import jax.numpy as jnp

from stark_tpu.merkle.tree import _build_jit


def lower(n):
    fn = _build_jit(n, False)
    return fn.lower(jax.ShapeDtypeStruct((n,), jnp.uint32))


def main():
    sizes_a = [1 << k for k in (10, 11, 12, 13)]
    sizes_b = [1 << k for k in (14, 15, 16, 17)]

    lowered_a = {n: lower(n) for n in sizes_a}
    lowered_b = {n: lower(n) for n in sizes_b}

    t0 = time.time()
    for n in sizes_a:
        lowered_a[n].compile()
    serial = time.time() - t0
    print(f"serial  compile {len(sizes_a)} tree programs "
          f"(2^10..2^13): {serial:.1f}s", flush=True)

    t0 = time.time()
    with cf.ThreadPoolExecutor(len(sizes_b)) as ex:
        futs = [ex.submit(lowered_b[n].compile) for n in sizes_b]
        for f in futs:
            f.result()
    par = time.time() - t0
    print(f"parallel compile {len(sizes_b)} tree programs "
          f"(2^14..2^17): {par:.1f}s", flush=True)
    print("PROBE-E DONE", flush=True)


if __name__ == "__main__":
    main()
