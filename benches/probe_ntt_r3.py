"""NTT 2^22 ground-truth re-measurement (VERDICT r2 task 1).

Clean slope-method harness: tables ride as loop-invariant jit ARGUMENTS
(never nested-jit literals), k=1 vs k=4 chain depths, N samples with
median +- spread.  Pieces measured separately:

  1. XLA four-step marginal
  2. Pallas fused path marginal (production kernel, gathers included)
  3. Pallas kernels only (pre-gathered inputs; isolates VPU compute)
  4. XLA glue only (bitrev row-gather + transpose + row-gather)

The r2 claim (0.86 ms marginal) vs the r2 recorded number (2.57 ms) is
settled by whatever this prints.
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
LOG_N = 22
N = 1 << LOG_N


def slope(make_chained, x0, args, total=16, reps=3, samples=3):
    """Marginal per-application cost via the k=1 vs k=4 slope, sampled
    `samples` times; returns (median_ms, spread_ms, percall_median_ms)."""
    fns = {k: make_chained(total // k, k) for k in (1, 4)}

    def run(k):
        r = fns[k](x0, *args)
        _ = np.asarray(r.reshape(-1)[:1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fns[k](x0, *args)
            _ = np.asarray(r.reshape(-1)[:1])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    vs, percall = [], []
    for _ in range(samples):
        t1, t4 = run(1), run(4)
        vs.append(max((4 * t4 - t1) / (3 * total), 1e-9))
        percall.append(t1 / total)
    vs.sort()
    med = vs[len(vs) // 2]
    spread = vs[-1] - vs[0]
    return med * 1e3, spread * 1e3, statistics.median(percall) * 1e3


def main():
    from stark_tpu.ntt.fourstep import get_fourstep_plan
    from stark_tpu.ntt.pallas_ntt import _plan as pallas_plan

    print(f"device: {jax.devices()[0]}", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        return (x ^ (x >> jnp.uint32(13))) % jnp.uint32(P)

    x = gen(N, jnp.uint32(3))
    _ = np.asarray(x[:1])

    # -- 1. XLA four-step ---------------------------------------------------
    xp = get_fourstep_plan(P, N, False)

    def mk_xla(iters, k):
        def body(i, v):
            for _ in range(k):
                v = xp._transform(v, *rest_tracers[0])
            return v

        @jax.jit
        def chained(v, table, tws1, tws2):
            rest_tracers[0] = (table, tws1, tws2)
            return jax.lax.fori_loop(0, iters, body, v)

        rest_tracers = [None]
        return chained

    t0 = time.time()
    med, spr, percall = slope(mk_xla, x, (xp._table, xp._tws1, xp._tws2))
    print(f"1. XLA four-step marginal: {med:.2f} ms (spread {spr:.2f}, "
          f"per-call {percall:.2f}; compile+meas {time.time()-t0:.0f}s)",
          flush=True)

    # -- 2. Pallas production path -------------------------------------------
    pp = pallas_plan(P, N, False, False)

    def mk_pallas(iters, k):
        def body(i, v):
            for _ in range(k):
                v = pp._run(v, *rest[0])
            return v

        @jax.jit
        def chained(v, table, tws1, tws2, rev1, rev2):
            rest[0] = (table, tws1, tws2, rev1, rev2)
            return jax.lax.fori_loop(0, iters, body, v)

        rest = [None]
        return chained

    t0 = time.time()
    med, spr, percall = slope(
        mk_pallas, x, (pp.table, pp.tws1, pp.tws2, pp.rev1, pp.rev2))
    print(f"2. Pallas path marginal: {med:.2f} ms (spread {spr:.2f}, "
          f"per-call {percall:.2f}; compile+meas {time.time()-t0:.0f}s)",
          flush=True)

    # -- 3. Pallas kernels only (no gathers/transpose) -----------------------
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = pp.n1, pp.n2

    def k1_only(a, table, tws1):
        return pl.pallas_call(
            pp._step1_kernel,
            out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
            grid=(n2 // 128,),
            in_specs=[
                pl.BlockSpec((n1, 128), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, 128), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tws1.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n1, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(a, table, tws1)

    def mk_k1(iters, k):
        def body(i, v):
            for _ in range(k):
                v = k1_only(v, *rest[0])
            return v

        @jax.jit
        def chained(v, table, tws1):
            rest[0] = (table, tws1)
            return jax.lax.fori_loop(0, iters, body, v)

        rest = [None]
        return chained

    a0 = x.reshape(n1, n2)
    t0 = time.time()
    med, spr, percall = slope(mk_k1, a0, (pp.table, pp.tws1))
    print(f"3. K1 kernel alone (x2 ~= both kernels): {med:.2f} ms "
          f"(spread {spr:.2f}; compile+meas {time.time()-t0:.0f}s)",
          flush=True)

    # -- 4. XLA glue only -----------------------------------------------------
    def glue(v, rev1, rev2):
        a = jnp.take(v.reshape(n1, n2), rev1, axis=0)
        ct = jnp.take(a.T, rev2, axis=0)
        return ct.reshape(N)

    def mk_glue(iters, k):
        def body(i, v):
            for _ in range(k):
                v = glue(v, *rest[0])
            return v

        @jax.jit
        def chained(v, rev1, rev2):
            rest[0] = (rev1, rev2)
            return jax.lax.fori_loop(0, iters, body, v)

        rest = [None]
        return chained

    t0 = time.time()
    med, spr, percall = slope(mk_glue, x, (pp.rev1, pp.rev2))
    print(f"4. XLA glue alone (gather + T + gather): {med:.2f} ms "
          f"(spread {spr:.2f}; compile+meas {time.time()-t0:.0f}s)",
          flush=True)
    print("PROBE-NTT-R3 DONE", flush=True)


if __name__ == "__main__":
    main()
