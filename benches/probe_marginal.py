"""Probe: separate the fixed per-iteration overhead from the true
marginal NTT kernel cost on the tunneled TPU.

Observed (probe_injit_results): XLA four-step and Pallas fused in-jit
fori_loop timings share a common ~0.86 ms size-independent term
(2^20 -> 2^22 scales 1.56x for 4x data, same affine fit both paths).
Hypotheses: (a) per-fori-iteration sync/drain, (b) per-HLO-op launch
bubbles, (c) tunnel timing floor.  This probe separates them:

  null  : fori_loop body = v + 1            -> per-iteration floor
  k=1   : body = 1 NTT                      -> t1 (what bench.py records)
  k=4   : body = 4 chained NTTs, iters/4    -> t4; if t4 << t1 the
          overhead is per-iteration and the honest kernel cost is
          (4*t4 - t1) / 3 (slope); if t4 ~= t1 it is per-op/bubble.

Prints one line per measurement; JSON summary last.  Run AFTER the
recovery pipeline's own probes (one TPU client at a time).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

P = 3 * 2**30 + 1


def timed(fn, x, sync_elems=1, reps=3):
    r = fn(x)
    _ = np.asarray(r.reshape(-1)[:sync_elems])  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(x)
        _ = np.asarray(r.reshape(-1)[:sync_elems])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def loop_fn(step, iters, k):
    def body(i, v):
        for _ in range(k):
            v = step(v)
        return v

    @jax.jit
    def run(x):
        return lax.fori_loop(0, iters, body, x)

    return run


def main():
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                              else "20,22").split(",")]
    out = {}
    for logn in sizes:
        n = 1 << logn
        x = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)) % \
            jnp.uint32(P)
        row = {}
        # null body: pure per-iteration floor at this shape
        t = timed(loop_fn(lambda v: v + jnp.uint32(1), 16, 1), x) / 16
        row["null_ms"] = t * 1e3
        print(f"logn={logn} null  {t*1e3:.3f} ms/iter", flush=True)

        from stark_tpu.ntt.fourstep import get_fourstep_plan
        plan = get_fourstep_plan(P, n)
        step = lambda v: plan._transform(v, plan._table, plan._tws1,
                                         plan._tws2)
        t1 = timed(loop_fn(step, 16, 1), x) / 16
        print(f"logn={logn} xla k=1  {t1*1e3:.3f} ms/NTT", flush=True)
        t4 = timed(loop_fn(step, 4, 4), x) / 16
        print(f"logn={logn} xla k=4  {t4*1e3:.3f} ms/NTT  "
              f"slope={(16*t4 - 4*t1)/12*1e3:.3f} ms", flush=True)
        row["xla_k1_ms"] = t1 * 1e3
        row["xla_k4_ms"] = t4 * 1e3
        row["xla_marginal_ms"] = (16 * t4 - 4 * t1) / 12 * 1e3

        if 14 <= logn <= 22:
            from stark_tpu.ntt.pallas_ntt import _plan as pallas_plan
            pp = pallas_plan(P, n, False, False)
            pstep = lambda v: pp._run(v, pp.table, pp.tws1, pp.tws2,
                                      pp.rev1, pp.rev2)
            p1 = timed(loop_fn(pstep, 16, 1), x) / 16
            p4 = timed(loop_fn(pstep, 4, 4), x) / 16
            print(f"logn={logn} pallas k=1 {p1*1e3:.3f} k=4 {p4*1e3:.3f} "
                  f"slope={(16*p4 - 4*p1)/12*1e3:.3f} ms", flush=True)
            row["pallas_k1_ms"] = p1 * 1e3
            row["pallas_k4_ms"] = p4 * 1e3
            row["pallas_marginal_ms"] = (16 * p4 - 4 * p1) / 12 * 1e3
        out[f"2e{logn}"] = row
    print("MARGINAL-JSON " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
