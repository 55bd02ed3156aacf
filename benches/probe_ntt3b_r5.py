"""Marginal (pipelined) cost of 3-step vs four-step: K back-to-back
applications, one sync — the regime big-prove LDEs actually run in."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from stark_tpu.config import DEFAULT_MODULUS as P
from stark_tpu.ntt.fourstep import get_fourstep_plan
from stark_tpu.ntt.pallas_ntt import _plan3

def dev_rand(n, salt=1):
    import functools
    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        x = x ^ (x >> jnp.uint32(13)); x = x * jnp.uint32(1274126177)
        return x % jnp.uint32(P)
    return gen(n, jnp.uint32(salt))

def marginal(fn, x, k=12, reps=5):
    y = fn(x); jax.block_until_ready(y)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = fn(y)
        jax.block_until_ready(y)
        ts.append((time.perf_counter() - t0) / k)
    ts.sort()
    return ts[0], ts[len(ts)//2]

for log_n in (23, 24, 26):
    n = 1 << log_n
    x = dev_rand(n, salt=log_n)
    p3 = _plan3(P, n, False, False)
    p4 = get_fourstep_plan(P, n, False)
    m3, med3 = marginal(p3, x)
    m4, med4 = marginal(p4, x)
    print(f"2^{log_n}: 3-step {m3*1e3:.2f} ms/call min (med {med3*1e3:.2f}) | "
          f"four-step {m4*1e3:.2f} (med {med4*1e3:.2f}) | speedup {m4/m3:.2f}x", flush=True)
print("DONE")
