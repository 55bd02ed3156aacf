"""Does the persistent compilation cache cover Mosaic (Pallas) kernels on
this backend, and is the loop-form SHA compress as fast as unrolled?

Run twice: first call compiles, second process should hit the cache if
Mosaic programs are covered.  Usage:
    python probe_mosaic_cache.py [unrolled|loop] [xla_caches_mode]
"""
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("STARK_TPU_COMPILE_CACHE", "/tmp/mosaic_cache_probe")

mode = sys.argv[1] if len(sys.argv) > 1 else "unrolled"
xla_mode = sys.argv[2] if len(sys.argv) > 2 else None

import jax

if xla_mode:
    jax.config.update("jax_persistent_cache_enable_xla_caches", xla_mode)

import jax.numpy as jnp
import numpy as np

M = 1 << 21


def main():
    from stark_tpu.hash.pallas_sha import _node_call
    from stark_tpu.hash import pallas_sha

    if mode == "loop":
        # force the loop-form compress on TPU by monkeypatching the factory
        orig = pallas_sha._make_node_kernel

        def make(loop):
            return orig(loop=True)

        pallas_sha._make_node_kernel = make

        def node_fn(l, r):
            # loop form needs the kt input — replicate _node_call's wiring
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from stark_tpu.hash.pallas_sha import _kt, LANES, _ROWS

            rows = M // LANES
            block_rows = min(_ROWS, rows)
            grid = rows // block_rows
            in_specs = [
                pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            return pl.pallas_call(
                pallas_sha._make_node_kernel(loop=True),
                out_shape=jax.ShapeDtypeStruct((8, rows, LANES), jnp.uint32),
                grid=(grid,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((8, block_rows, LANES),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
            )(l.reshape(8, rows, LANES), r.reshape(8, rows, LANES), _kt())

        node = jax.jit(node_fn)
    else:
        node = _node_call(M, False)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n):
        i = jnp.arange(n, dtype=jnp.uint32)
        return (i * jnp.uint32(2654435761)).reshape(8, n // 8)

    planes = gen(8 * M)
    _ = np.asarray(planes[:1, :1])

    t0 = time.perf_counter()
    r = node(planes, planes)
    _ = np.asarray(r.reshape(-1)[:1])
    print(f"mode={mode} xla_caches={xla_mode} first call (compile): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    @jax.jit
    def chained(x):
        return jax.lax.fori_loop(
            0, 8, lambda i, v: node(v, v).reshape(8, M), x)

    r = chained(planes)
    _ = np.asarray(r.reshape(-1)[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = chained(planes)
        _ = np.asarray(r.reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    print(f"mode={mode} runtime: {statistics.median(ts)/8*1e3:.2f} ms "
          f"per 2^21-node level", flush=True)


if __name__ == "__main__":
    main()
