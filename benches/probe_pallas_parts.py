"""Per-component timing of the Pallas four-step NTT at one size:
row-gather, K1 (fused DIT+twiddle), transpose+row-gather, K2 — each
chained in-jit via fori_loop so tunnel dispatch is excluded.  Identifies
which part eats the 1.77 ms (theoretical HBM bound ~0.2 ms at 2^22)."""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from stark_tpu.ntt.pallas_ntt import _plan

P = 3 * 2**30 + 1
REPS = 30


def time_injit(core, x, reps=REPS):
    @jax.jit
    def loop(v):
        return lax.fori_loop(0, reps, lambda i, a: core(a), v)

    r = loop(x); r.block_until_ready()
    t0 = time.time(); r = loop(x); r.block_until_ready()
    return (time.time() - t0) / reps * 1e3


def main(logn: int):
    n = 1 << logn
    pp = _plan(P, n, False, False)
    n1, n2 = pp.n1, pp.n2
    fp = pp.fp
    x = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(P)
    a0 = jnp.take(x.reshape(n1, n2), pp.rev1, axis=0)

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k1_only(a):
        return pl.pallas_call(
            pp._step1_kernel,
            out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
            grid=(n2 // pp.lanes1,),
            in_specs=[
                pl.BlockSpec((n1, pp.lanes1), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, pp.lanes1), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pp.tws1.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n1, pp.lanes1), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(a, pp.table, pp.tws1)

    def k2_only(ct):
        return pl.pallas_call(
            pp._step2_kernel,
            out_shape=jax.ShapeDtypeStruct((n2, n1), jnp.uint32),
            grid=(n1 // pp.lanes2,),
            in_specs=[
                pl.BlockSpec((n2, pp.lanes2), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pp.tws2.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n2, pp.lanes2), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(ct, pp.tws2)

    parts = {
        "gather1": lambda v: jnp.take(v.reshape(n1, n2), pp.rev1,
                                      axis=0).reshape(n),
        "k1": lambda v: k1_only(v.reshape(n1, n2)).reshape(n),
        "transpose_gather2": lambda v: jnp.take(v.reshape(n1, n2).T, pp.rev2,
                                                axis=0).reshape(n),
        "k2": lambda v: k2_only(v.reshape(n2, n1)).reshape(n),
        "copy(baseline)": lambda v: v + jnp.uint32(1),
        "full": lambda v: pp._run(v, pp.table, pp.tws1, pp.tws2,
                                  pp.rev1, pp.rev2),
    }
    for name, fn in parts.items():
        ms = time_injit(fn, x)
        gb = 2 * n * 4 / ms / 1e6
        print(f"{name:20s} {ms:8.3f} ms   {gb:6.0f} GB/s(in+out)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 22)
