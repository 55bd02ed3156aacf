"""3-step Pallas NTT (>2^22) vs XLA four-step on hardware — r5 task 4.

Correctness: bit-identical outputs at every size.  Wall: chained-median
per call (min-of-N on the dispatch path; these are multi-launch plans so
the chained estimator does not apply directly — report min/median of
synced walls and the HBM roofline bound).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from stark_tpu.config import DEFAULT_MODULUS as P
from stark_tpu.ntt.fourstep import get_fourstep_plan
from stark_tpu.ntt.pallas_ntt import _plan3

dev = jax.devices()[0]
print("device:", dev, flush=True)

def dev_rand(n, salt=1):
    import functools
    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        x = x ^ (x >> jnp.uint32(13))
        x = x * jnp.uint32(1274126177)
        return x % jnp.uint32(P)
    return jax.device_put(gen(n, jnp.uint32(salt)), dev)

def wall(fn, x, reps=7):
    r = fn(x); jax.block_until_ready(r)
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); jax.block_until_ready(fn(x)); ts.append(time.perf_counter()-t0)
    ts.sort()
    return ts[0], ts[len(ts)//2]

for log_n in (23, 24, 25, 26):
    n = 1 << log_n
    x = dev_rand(n, salt=log_n)
    t0=time.perf_counter()
    p3 = _plan3(P, n, False, False)
    y3 = p3(x); jax.block_until_ready(y3)
    t_compile3 = time.perf_counter()-t0
    t0=time.perf_counter()
    p4 = get_fourstep_plan(P, n, False)
    y4 = p4(x); jax.block_until_ready(y4)
    t_compile4 = time.perf_counter()-t0
    # correctness: compare a digest of both outputs ON DEVICE (no big fetch)
    dig = jax.jit(lambda a, b: (jnp.sum(a ^ b), a[:8], b[:8]))
    s, a8, b8 = dig(y3, y4)
    identical = int(np.asarray(s)) == 0 and np.array_equal(np.asarray(a8), np.asarray(b8))
    m3, med3 = wall(p3, x)
    m4, med4 = wall(p4, x)
    hbm_bound_ms = (12 * n * 4) / 800e9 * 1e3  # ~12 passes @ 800 GB/s v5e
    print(f"2^{log_n}: identical={identical} | 3-step {m3*1e3:.2f} ms min "
          f"(med {med3*1e3:.2f}; compile+first {t_compile3:.1f}s) | "
          f"four-step {m4*1e3:.2f} ms min (med {med4*1e3:.2f}; compile+first {t_compile4:.1f}s) | "
          f"speedup {m4/m3:.2f}x | 12-pass HBM bound {hbm_bound_ms:.2f} ms", flush=True)
print("PROBE-NTT3 DONE")
