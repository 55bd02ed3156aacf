"""Probe: raw VPU throughput for u32 integer multiply vs f32 FMA on the
v5e, to decide whether a float-digit modmul (3x11-bit digits, exact FMA
products) could beat the u32 Montgomery path inside the Pallas NTT.

The Pallas fused NTT measures ~1.09 ms marginal at 2^22 (~8 HBM passes
=> ~0.15 ms bandwidth bound), i.e. VPU-compute-bound on the ~10 u32
multiplies per mont_mul.  If f32 FMA throughput is >= 4x the effective
u32-multiply rate, a digit-form kernel is worth building; otherwise the
XLA four-step (HBM-bound, ~0.86 ms marginal) stays the production path.

Times a fori_loop of k chained elementwise ops over a 2^24-element
vector, slope method as probe_marginal.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, x, reps=3):
    r = fn(x)
    _ = np.asarray(r.reshape(-1)[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(x)
        _ = np.asarray(r.reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def loop_fn(step, iters, k):
    def body(i, v):
        for _ in range(k):
            v = step(v)
        return v

    return jax.jit(lambda x: lax.fori_loop(0, iters, body, x))


def marginal(step, x, total=16):
    t1 = timed(loop_fn(step, total, 1), x)
    t4 = timed(loop_fn(step, total // 4, 4), x)
    return (4 * t4 - t1) / (3 * total)


def main():
    n = 1 << 24
    xi = jnp.arange(n, dtype=jnp.uint32) | jnp.uint32(1)
    xf = jnp.arange(n, dtype=jnp.float32) * jnp.float32(1e-9) + 1.0

    cases = {
        "u32_mul": (lambda v: v * v + jnp.uint32(1), xi),
        "u32_mulhi16": (  # the mont_mul building block: 4 muls + glue
            lambda v: (((v & jnp.uint32(0xFFFF)) * (v >> jnp.uint32(16)))
                       ^ (v * v)) + jnp.uint32(1), xi),
        "u32_add": (lambda v: v + (v >> jnp.uint32(1)), xi),
        "f32_fma": (lambda v: v * v + jnp.float32(1e-9), xf),
        "f32_floor": (lambda v: v - jnp.floor(v * jnp.float32(0.5)), xf),
    }
    for name, (step, x) in cases.items():
        v = marginal(step, x)
        print(f"{name:12s} {v*1e3:7.3f} ms/pass  "
              f"{n / max(v, 1e-12) / 1e9:8.2f} Gelem/s", flush=True)
    print("VPU-DONE", flush=True)


if __name__ == "__main__":
    main()
