"""Corrected marginal-cost estimator — and re-measurement of every
headline kernel with it.

The r2 `chain_marginal` (bench.py) and probe_ntt_r3 both estimated the
marginal per-application cost v from T(total,k=1) vs T(total/4,k=4).
With a per-RUN cost F (dispatch + 4-byte fetch + tunnel sync, ~25-30 ms
here) the algebra gives

    v_est = (4*T4 - T1)/(3*total) = v + F/total

i.e. a +F/16 ~= +1.7 ms bias at total=16 that dominated every sub-ms
kernel measurement and tracked tunnel-latency drift (the r2
"instability": 2.57 vs 2.28 vs 1.74 ms were different F's, same v).

Fix: hold the loop-iteration count N CONSTANT and vary only the chain
depth k of the body:

    T(N, k) = F + N*f + N*k*v   (f = per-iteration loop overhead)
    v = (T(N,4) - T(N,1)) / (3*N)      -- F and f cancel exactly.

Sanity checks built in: v at N=8 vs N=16 must agree (linearity), and we
report F+f from the intercept for the record.
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


def measure(make_chained, x0, args, n_iters=8, reps=5, samples=3):
    """v via same-N slope; returns (v_med_ms, spread_ms, T1_ms, T4_ms)."""
    fns = {k: make_chained(n_iters, k) for k in (1, 4)}

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

    vs, t1s, t4s = [], [], []
    for _ in range(samples):
        t1, t4 = run(1), run(4)
        vs.append(max((t4 - t1) / (3 * n_iters), 1e-9))
        t1s.append(t1)
        t4s.append(t4)
    vs.sort()
    med = vs[len(vs) // 2]
    return (med * 1e3, (vs[-1] - vs[0]) * 1e3,
            statistics.median(t1s) * 1e3, statistics.median(t4s) * 1e3)


def bench(name, step_builder, x0, args, n_iters=8):
    def mk(iters, k):
        def body(i, v):
            for _ in range(k):
                v = step_builder(v, *rest[0])
            return v

        import functools

        @jax.jit
        def chained(v, *a):
            rest[0] = a
            return jax.lax.fori_loop(0, iters, body, v)

        rest = [None]
        return chained

    t0 = time.time()
    v, spr, t1, t4 = measure(mk, x0, args, n_iters=n_iters)
    v2, spr2, _, _ = measure(mk, x0, args, n_iters=2 * n_iters)
    print(f"{name}: v = {v:.3f} ms (spread {spr:.3f}) | linearity check "
          f"N={2*n_iters}: {v2:.3f} (spread {spr2:.3f}) | T1={t1:.1f} "
          f"T4={t4:.1f} | compile+meas {time.time()-t0:.0f}s", flush=True)
    return v


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        return (x ^ (x >> jnp.uint32(13))) % jnp.uint32(P)

    x = gen(N, jnp.uint32(3))
    _ = np.asarray(x[:1])

    # F + f for the record: a no-op-ish body (1-element add chain)
    tiny = gen(8, jnp.uint32(1))

    def mk_tiny(iters, k):
        def body(i, v):
            for _ in range(k):
                v = v + jnp.uint32(1)
            return v

        @jax.jit
        def chained(v):
            return jax.lax.fori_loop(0, iters, body, v)

        return chained

    t0 = time.perf_counter()
    r = mk_tiny(8, 1)(tiny)
    _ = np.asarray(r[:1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = mk_tiny(8, 1)(tiny)
        _ = np.asarray(r[:1])
        ts.append(time.perf_counter() - t0)
    print(f"per-run overhead F (dispatch+fetch+sync, tiny program): "
          f"{statistics.median(ts)*1e3:.1f} ms", flush=True)

    # 1. XLA four-step NTT
    from stark_tpu.ntt.fourstep import get_fourstep_plan

    xp = get_fourstep_plan(P, N, False)
    bench("1 XLA four-step NTT 2^22",
          lambda v, t, w1, w2: xp._transform(v, t, w1, w2),
          x, (xp._table, xp._tws1, xp._tws2))

    # 2. Pallas NTT production path
    from stark_tpu.ntt.pallas_ntt import _plan as pallas_plan

    pp = pallas_plan(P, N, False, False)
    bench("2 Pallas NTT 2^22",
          lambda v, *a: pp._run(v, *a),
          x, (pp.table, pp.tws1, pp.tws2, pp.rev1, pp.rev2))

    # 3. XLA glue alone
    n1, n2 = pp.n1, pp.n2

    def glue(v, rev1, rev2):
        a = jnp.take(v.reshape(n1, n2), rev1, axis=0)
        ct = jnp.take(a.T, rev2, axis=0)
        return ct.reshape(N)

    bench("3 XLA glue [gather+T+gather]", glue, x, (pp.rev1, pp.rev2))

    # 4. single row-gather
    x2 = x.reshape(n1, n2)
    bench("4 XLA row-gather", lambda v, r: jnp.take(v, r, axis=0),
          x2, (pp.rev1,))

    # 5. transpose
    bench("5 XLA transpose", lambda v: v.T, x2, ())

    # 6. field mul (the bench.py headline secondary)
    b = gen(N, jnp.uint32(7))
    from stark_tpu.fields import Fp

    f = Fp.get(P)
    bench("6 field mul 2^22", lambda v, bb: f.mul(v, bb), x, (b,))

    # 7. Merkle bitrev tree build 2^22
    from stark_tpu.hash.pallas_sha import build_tree_bitrev

    def mk_step(v):
        levels = build_tree_bitrev(v)
        return v ^ levels[-1][0, 0]

    bench("7 Merkle bitrev tree 2^22", lambda v: mk_step(v), x, (),
          n_iters=4)

    print("PROBE-SLOPE2 DONE", flush=True)


if __name__ == "__main__":
    main()
