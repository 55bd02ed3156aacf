"""MXU-NTT recombination cost — measured, not estimated (VERDICT r2
task 8).

The radix-128 MXU decomposition would run each sub-DFT as exact int8
limb matmuls: 4 limbs per operand -> 16 partial-product matmuls whose
k-weight planes (k = li+lj in 0..6, weight 2^(8k)) must be recombined
per element into a ~71-bit integer and reduced mod p, per stage (3
stages at 2^22: 128^3 decomposition + final radix-4 tail; the matmuls
themselves are ~66 us at 394 int8-TOPS and are not the question).

This probe measures the recombination microkernel on hardware: modular
Horner over the 7 planes, x = ((...(P6*256 + P5)*256 + ...)*256 + P0)
mod p, entirely in u32 field ops (fields/fp.py mul-by-256 via
mont_mul).  Chained with the corrected same-N slope (probe_slope2.py).

Verdict criterion: an MXU NTT needs 3 recombination sweeps over all
2^22 elements.  If 3 * (2^22 / rate) is not clearly below the measured
0.73 ms XLA four-step, the MXU path loses and the PERF_MODEL rejection
is upgraded from estimated to measured.
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
ROWS, LANES = 2048, 128  # one (2048, 128) strip = 2^18 elements
NPLANES = 7


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    from stark_tpu.fields import Fp

    f = Fp.get(P)

    # plausible partial-sum planes: i32 values < 2^21 (128-deep int8 dot)
    key_vals = (np.arange(NPLANES * ROWS * LANES, dtype=np.int64)
                * 2654435761) % (1 << 21)
    planes0 = jnp.asarray(key_vals.reshape(NPLANES, ROWS, LANES)
                          .astype(np.uint32))
    _ = np.asarray(planes0[:1, :1, :1])

    two56 = jnp.uint32(256 % P)

    def recombine(planes):
        # modular Horner: x = P6; x = x*256 + Pk (mod p), k = 5..0
        x = planes[NPLANES - 1] % jnp.uint32(P)
        for k in range(NPLANES - 2, -1, -1):
            x = f.add(f.mul(x, two56), planes[k] % jnp.uint32(P))
        return x

    def redistribute(x):
        # cheap, measured separately and subtracted: split x back into 7
        # pseudo-planes so the chain has a data dependency
        return jnp.stack([(x >> jnp.uint32(min(4 * k, 28))) & jnp.uint32(
            (1 << 21) - 1) for k in range(NPLANES)])

    def body_full(planes):
        return redistribute(recombine(planes))

    def body_base(planes):
        # baseline: same redistribute, trivial "recombination" (one add)
        acc = planes[0]
        for k in range(1, NPLANES):
            acc = acc + planes[k]
        return jnp.stack([(acc >> jnp.uint32(min(4 * k, 28))) &
                          jnp.uint32((1 << 21) - 1)
                          for k in range(NPLANES)])

    def slope(step, x0, n_iters=32, reps=5, samples=3):
        def mk(k):
            def body(i, v):
                for _ in range(k):
                    v = step(v)
                return v

            @jax.jit
            def chained(x):
                return jax.lax.fori_loop(0, n_iters, body, x)

            return chained

        fns = {k: mk(k) for k in (1, 4)}

        def run(k):
            r = fns[k](x0)
            _ = np.asarray(r.reshape(-1)[:1])
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                r = fns[k](x0)
                _ = np.asarray(r.reshape(-1)[:1])
                ts.append(time.perf_counter() - t0)
            return statistics.median(ts)

        vs = []
        for _ in range(samples):
            t1, t4 = run(1), run(4)
            vs.append(max((t4 - t1) / (3 * n_iters), 1e-9))
        vs.sort()
        return vs[len(vs) // 2], vs[-1] - vs[0]

    n_elem = ROWS * LANES
    t0 = time.time()
    v_full, s_full = slope(body_full, planes0)
    v_base, s_base = slope(body_base, planes0)
    v_rec = max(v_full - v_base, 1e-9)
    rate = n_elem / v_rec
    print(f"full (recombine+redistribute): {v_full*1e6:.1f} us/strip "
          f"(spread {s_full*1e6:.1f})", flush=True)
    print(f"baseline (adds+redistribute):  {v_base*1e6:.1f} us/strip "
          f"(spread {s_base*1e6:.1f})", flush=True)
    print(f"recombination alone: {v_rec*1e6:.1f} us per 2^18 elements "
          f"=> {rate/1e9:.2f} Gelem/s", flush=True)

    full_sweeps = 3 * (1 << 22) / rate
    print(f"MXU-NTT recombination cost at 2^22 (3 stages): "
          f"{full_sweeps*1e3:.2f} ms  vs measured XLA four-step 0.73 ms",
          flush=True)
    verdict = ("REJECTED: recombination alone exceeds the whole four-step"
               if full_sweeps > 0.73e-3 else
               "VIABLE: recombination leaves budget — prototype the matmuls")
    print(f"verdict: {verdict}  [{time.time()-t0:.0f}s]", flush=True)
    print("PROBE-MXU DONE", flush=True)


if __name__ == "__main__":
    main()
