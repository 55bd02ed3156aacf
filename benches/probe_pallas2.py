"""Round-2 probe D: the rewritten DIT Pallas NTT (ntt/pallas_ntt.py) on
real TPU — correctness vs the XLA plan, compile time, and chained wall
time at 2^14..2^22.  Incremental prints; run in background."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

P = 3 * 2**30 + 1


def main():
    from stark_tpu.ntt.fourstep import get_fourstep_plan
    from stark_tpu.ntt.pallas_ntt import _plan

    for logn in (14, 18, 20, 22):
        n = 1 << logn
        x = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)) % jnp.uint32(P)
        t0 = time.time()
        try:
            plan = _plan(P, n, False, False)
            y = plan(x)
            y.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"logn={logn} PALLAS FAIL: {type(e).__name__}: {e}",
                  flush=True)
            continue
        comp = time.time() - t0
        # correctness vs the XLA four-step (or 1-D) plan
        from stark_tpu.ntt.ntt import get_plan
        ref = get_plan(P, n, False)(x)
        ok = bool(jnp.array_equal(y, ref))
        print(f"logn={logn} compile={comp:.1f}s correct={ok}", flush=True)
        if not ok:
            a = np.asarray(y[:8]); b = np.asarray(ref[:8])
            print(f"  pallas[:8]={a} ref[:8]={b}", flush=True)
            continue
        reps = 30

        @jax.jit
        def loop(v, _plan_fn=plan._jit, _pl=plan):
            return lax.fori_loop(
                0, reps,
                lambda i, a: _plan_fn(a, _pl.table, _pl.tws1, _pl.tws2,
                                      _pl.rev1, _pl.rev2), v)

        t0 = time.time()
        r = loop(x); np.asarray(r[:1])
        comp2 = time.time() - t0
        t0 = time.time()
        r = loop(x); np.asarray(r[:1])
        ms = (time.time() - t0) / reps * 1e3
        gbs = 2 * n * 4 / ms / 1e6
        print(f"logn={logn} pallas {ms:.3f} ms  {gbs:.0f} GB/s(in+out) "
              f"loop-compile={comp2:.1f}s", flush=True)
    print("PROBE-D DONE", flush=True)


if __name__ == "__main__":
    main()
