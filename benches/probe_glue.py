"""Decompose the NTT glue cost (probe_ntt_r3: 1.64 ms of the 2.23 ms
Pallas path at 2^22) with the SLOPE method (k=1 vs k=4 chained per loop
body — a bare fori_loop iteration pays a large fixed cost on the
tunneled TPU, so total/iters is meaningless for sub-ms ops):

  A. XLA bitrev row-gather          (current rev1/rev2 implementation)
  B. XLA transpose (materialized)
  C. Pallas strip transpose         ((128, n) -> (n, 128) in-kernel .T)
  D. Pallas scalar-prefetch row-gather ((8, n) blocks, data-dep index map)
  E. in-kernel lane rev7 via 3-pass masked-roll network
  G. full current glue [gather + T + gather]   (reproduces probe_ntt #4)

E qualifies the fused-write trick: bitrev of a grid+lane axis = rev4 in
the out index map (free) + rev7 lane permute in-VMEM.
"""
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1 = N2 = 2048
P = 3 * 2**30 + 1


def bitrev(l):
    bits = l.bit_length() - 1
    idx = np.arange(l, dtype=np.int32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


def slope(name, fn, x0, total=16, reps=3, samples=3):
    def make(iters, k):
        def body(i, v):
            for _ in range(k):
                v = fn(v)
            return v

        @jax.jit
        def chained(x):
            return jax.lax.fori_loop(0, iters, body, x)

        return chained

    t0 = time.time()
    fns = {k: make(total // k, k) for k in (1, 4)}

    def run(k):
        r = fns[k](x0)
        _ = np.asarray(r.reshape(-1)[:1])
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            r = fns[k](x0)
            _ = np.asarray(r.reshape(-1)[:1])
            ts.append(time.perf_counter() - t1)
        return statistics.median(ts)

    vs = []
    for _ in range(samples):
        t1, t4 = run(1), run(4)
        vs.append(max((4 * t4 - t1) / (3 * total), 1e-9))
    vs.sort()
    med, spr = vs[len(vs) // 2], vs[-1] - vs[0]
    print(f"{name}: {med*1e3:.3f} ms marginal (spread {spr*1e3:.3f}; "
          f"compile+meas {time.time()-t0:.0f}s)", flush=True)
    return med * 1e3


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    x = (jnp.arange(N1 * N2, dtype=jnp.uint32) * jnp.uint32(2654435761)
         % jnp.uint32(P)).reshape(N1, N2)
    _ = np.asarray(x[:1, :1])

    rev = jnp.asarray(bitrev(N1))
    rev8 = jnp.asarray(bitrev(N1 // 8).astype(np.int32))
    rev7 = bitrev(128)

    slope("A xla row-gather", lambda v: jnp.take(v, rev, axis=0), x)
    slope("B xla transpose", lambda v: v.T, x)

    def tkern(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    def pallas_t(v):
        return pl.pallas_call(
            tkern,
            out_shape=jax.ShapeDtypeStruct((N2, N1), jnp.uint32),
            grid=(N1 // 128,),
            in_specs=[pl.BlockSpec((128, N2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N2, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(v)

    try:
        slope("C pallas strip transpose", pallas_t, x)
    except Exception as e:
        print(f"C FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    def gkern(idx_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def pallas_gather8(v):
        return pl.pallas_call(
            gkern,
            out_shape=jax.ShapeDtypeStruct((N1, N2), jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N1 // 8,),
                in_specs=[pl.BlockSpec((8, N2), lambda i, idx: (idx[i], 0))],
                out_specs=pl.BlockSpec((8, N2), lambda i, idx: (i, 0)),
            ),
        )(rev8, v)

    try:
        slope("D pallas prefetch row-gather (8-row blocks)", pallas_gather8, x)
    except Exception as e:
        print(f"D FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    def roll_rev7(xb):
        lane = jax.lax.broadcasted_iota(jnp.uint32, xb.shape, 1)
        for (i, j) in ((0, 6), (1, 5), (2, 4)):
            d = (1 << j) - (1 << i)
            bi = (lane >> jnp.uint32(i)) & jnp.uint32(1)
            bj = (lane >> jnp.uint32(j)) & jnp.uint32(1)
            differ = bi != bj
            up = pltpu.roll(xb, 128 - d, 1)
            down = pltpu.roll(xb, d, 1)
            moved = jnp.where(bi == 1, up, down)
            xb = jnp.where(differ, moved, xb)
        return xb

    def fkern(x_ref, o_ref):
        o_ref[:] = roll_rev7(x_ref[:])

    def pallas_rollperm(v):
        return pl.pallas_call(
            fkern,
            out_shape=jax.ShapeDtypeStruct((N1, N2), jnp.uint32),
            grid=(N2 // 128,),
            in_specs=[pl.BlockSpec((N1, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N1, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(v)

    try:
        want = np.asarray(x)[:4, :128][:, rev7]
        got = np.asarray(pallas_rollperm(x))[:4, :128]
        ok = np.array_equal(want, got)
        slope(f"E pallas lane rev7 rolls (correct={ok})", pallas_rollperm, x)
    except Exception as e:
        print(f"E FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    def glue(v):
        a = jnp.take(v, rev, axis=0)
        return jnp.take(a.T, rev, axis=0)

    slope("G full XLA glue [gather+T+gather]", glue, x)

    def glue_pallas(v):
        a = pallas_gather8(v)
        b = pallas_t(a)
        return pallas_gather8(b)

    try:
        slope("H pallas glue [pgather+ptranspose+pgather]", glue_pallas, x)
    except Exception as e:
        print(f"H FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    print("PROBE-GLUE DONE", flush=True)


if __name__ == "__main__":
    main()
