"""Accurate NTT kernel timing: loop the transform INSIDE one jit via
lax.fori_loop so tunnel dispatch overhead (~0.3-0.5 ms/call) is excluded.
Compares the XLA four-step plan vs the Pallas fused plan per size."""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from stark_tpu.ntt.fourstep import get_fourstep_plan
from stark_tpu.ntt.ntt import get_stockham_plan

P = 3 * 2**30 + 1
REPS = 30


def time_injit(core, x, reps=REPS):
    @jax.jit
    def loop(v):
        return lax.fori_loop(0, reps, lambda i, a: core(a), v)

    r = loop(x); r.block_until_ready()          # compile + warm
    t0 = time.time(); r = loop(x); r.block_until_ready()
    t1 = time.time()
    return (t1 - t0) / reps * 1e3               # ms per transform


def main(sizes, which):
    for logn in sizes:
        n = 1 << logn
        x = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(P)
        if "xla" in which:
            plan = get_fourstep_plan(P, n) if n >= (1 << 14) else \
                get_stockham_plan(P, n)
            f = lambda v: plan._transform(v, plan._table, plan._tws1,
                                          plan._tws2) \
                if hasattr(plan, "_table") else \
                (lambda v: plan._transform(v, plan._twiddles))(v)
            ms = time_injit(f, x)
            gbps = 2 * n * 4 / ms / 1e6
            print(f"XLA   logn={logn} {ms:.3f} ms  eff-bw {gbps:.0f} GB/s "
                  f"(in/out only)", flush=True)
        if "pallas" in which:
            from stark_tpu.ntt.pallas_ntt import _plan
            pp = _plan(P, n, False, False)
            f = lambda v: pp._run(v, pp.table, pp.tws1, pp.tws2,
                                  pp.rev1, pp.rev2)
            t0 = time.time()
            ms = time_injit(f, x)
            print(f"PALLAS logn={logn} {ms:.3f} ms  (compile+run "
                  f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1].split(",")]
    which = sys.argv[2] if len(sys.argv) > 2 else "xla,pallas"
    main(sizes, which)
