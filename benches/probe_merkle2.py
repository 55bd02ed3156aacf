"""New bitrev tree build on hardware: warm time + cold compile at 2^22,
plus root equality with the XLA build at 2^17 (cheap cross-check)."""
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


def chain_time(step, x0, iters=4, reps=3):
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
    from stark_tpu.hash.pallas_sha import build_tree_bitrev
    from stark_tpu.merkle.tree import MerkleTree, bitrev_layouts, _build_jit

    print(f"device: {jax.devices()[0]}", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        return (x ^ (x >> jnp.uint32(13))) % jnp.uint32(P)

    # correctness cross-check at 2^17 on hardware (root + one auth path)
    small = gen(1 << 17, jnp.uint32(9))
    _ = np.asarray(small[:1])
    t0 = time.time()
    got = MerkleTree(None,
                     device_levels=build_tree_bitrev(small),
                     layouts=bitrev_layouts(1 << 17))
    want = MerkleTree(None, device_levels=_build_jit(1 << 17)(small))
    assert got.root() == want.root(), (got.root(), want.root())
    assert got.get_authentication_path(12345) == \
        want.get_authentication_path(12345)
    print(f"2^17 hw cross-check OK (compile+run {time.time()-t0:.1f}s)",
          flush=True)

    values = gen(N, jnp.uint32(1))
    _ = np.asarray(values[:1])

    def tree_step(v):
        levels = build_tree_bitrev(v)
        return v ^ levels[-1][0, 0]

    t0 = time.time()
    t = chain_time(tree_step, values, iters=4)
    print(f"bitrev tree 2^22 (compile+first {time.time()-t0:.1f}s): "
          f"{t*1e3:.2f} ms ({N/t/1e6:.1f} M leaves/s)", flush=True)
    print("PROBE-MERKLE2 DONE", flush=True)


if __name__ == "__main__":
    main()
