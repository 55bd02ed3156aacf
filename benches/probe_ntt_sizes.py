"""Pallas vs XLA four-step NTT across sizes, corrected estimator
(same-N slope: v = (T(N,4) - T(N,1)) / (3N) — see probe_slope2.py).
Decides the _AutoPlan dispatch with evidence."""
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = 3 * 2**30 + 1


def measure(step, x0, args, n_iters=8, reps=5, samples=3):
    def mk(k):
        def body(i, v):
            for _ in range(k):
                v = step(v, *rest[0])
            return v

        @jax.jit
        def chained(v, *a):
            rest[0] = a
            return jax.lax.fori_loop(0, n_iters, body, v)

        rest = [None]
        return chained

    fns = {k: mk(k) for k in (1, 4)}

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

    vs = []
    for _ in range(samples):
        t1, t4 = run(1), run(4)
        vs.append(max((t4 - t1) / (3 * n_iters), 1e-9))
    vs.sort()
    return vs[len(vs) // 2] * 1e3, (vs[-1] - vs[0]) * 1e3


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    import functools

    from stark_tpu.ntt.fourstep import get_fourstep_plan
    from stark_tpu.ntt.pallas_ntt import _plan as pallas_plan

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        return (x ^ (x >> jnp.uint32(13))) % jnp.uint32(P)

    for log_n in (14, 16, 18, 20, 22):
        n = 1 << log_n
        x = gen(n, jnp.uint32(3))
        _ = np.asarray(x[:1])
        xp = get_fourstep_plan(P, n, False)
        t0 = time.time()
        v_x, s_x = measure(lambda v, t, w1, w2: xp._transform(v, t, w1, w2),
                           x, (xp._table, xp._tws1, xp._tws2))
        pp = pallas_plan(P, n, False, False)
        v_p, s_p = measure(lambda v, *a: pp._run(v, *a), x,
                           (pp.table, pp.tws1, pp.tws2, pp.rev1, pp.rev2))
        print(f"2^{log_n}: XLA {v_x:.3f} ms (±{s_x:.3f})  Pallas {v_p:.3f} "
              f"ms (±{s_p:.3f})  [{time.time()-t0:.0f}s]", flush=True)
    print("PROBE-NTT-SIZES DONE", flush=True)


if __name__ == "__main__":
    main()
