"""Big-trace re-measurement with the round-3 machinery (VERDICT r2
task 5): warm full proves at 2^18 / 2^20 / 2^22 / 2^24 rows, plus the
2^24-point NTT marginal under the corrected estimator (probe_slope2
methodology) for the radix-4 verdict.

Writes benches/big_proves_r3.json and prints the README table rows.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.config import ProverConfig
    from stark_tpu.stark import prove, verify

    print(f"device: {jax.devices()[0]}", flush=True)
    out = {}

    # -- NTT 2^24 marginal (XLA four-step, radix-4 engaged) ---------------
    from stark_tpu.ntt.fourstep import get_fourstep_plan

    P = 3 * 2**30 + 1
    N = 1 << 24

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def gen(n, salt):
        i = jnp.arange(n, dtype=jnp.uint32)
        x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
        return (x ^ (x >> jnp.uint32(13))) % jnp.uint32(P)

    x = gen(N, jnp.uint32(3))
    _ = np.asarray(x[:1])
    xp = get_fourstep_plan(P, N, False)

    def mk(k, n_iters=4):
        def body(i, v):
            for _ in range(k):
                v = xp._transform(v, *rest[0])
            return v

        @jax.jit
        def chained(v, *a):
            rest[0] = a
            return jax.lax.fori_loop(0, n_iters, body, v)

        rest = [None]
        return chained

    t0 = time.time()
    fns = {k: mk(k) for k in (1, 4)}

    def run(k):
        r = fns[k](x, xp._table, xp._tws1, xp._tws2)
        _ = np.asarray(r.reshape(-1)[:1])
        ts = []
        for _ in range(4):
            t1 = time.perf_counter()
            r = fns[k](x, xp._table, xp._tws1, xp._tws2)
            _ = np.asarray(r.reshape(-1)[:1])
            ts.append(time.perf_counter() - t1)
        return statistics.median(ts)

    vs = []
    for _ in range(3):
        t1, t4 = run(1), run(4)
        vs.append(max((t4 - t1) / (3 * 4), 1e-9))
    vs.sort()
    out["ntt_2e24_ms"] = vs[1] * 1e3
    out["ntt_2e24_spread_ms"] = (vs[-1] - vs[0]) * 1e3
    print(f"NTT 2^24 (radix-4 four-step): {vs[1]*1e3:.2f} ms marginal "
          f"(spread {(vs[-1]-vs[0])*1e3:.2f}; meas {time.time()-t0:.0f}s)",
          flush=True)
    del x, fns

    # -- warm proves -------------------------------------------------------
    for log2_tr, blowup in ((18, 8), (20, 4), (22, 4), (24, 4)):
        cfg = ProverConfig(log2_trace=log2_tr, blowup=blowup,
                           num_queries=16)
        t0 = time.time()
        pf = prove(cfg)
        first = time.time() - t0
        ts = []
        for _ in range(3 if log2_tr <= 22 else 2):
            t0 = time.perf_counter()
            pf = prove(cfg)
            ts.append(time.perf_counter() - t0)
        warm = statistics.median(ts)
        assert verify(pf)
        out[f"prove_2e{log2_tr}_first_s"] = first
        out[f"prove_2e{log2_tr}_warm_s"] = warm
        print(f"prove 2^{log2_tr} rows (blowup {blowup}, domain "
              f"2^{log2_tr + blowup.bit_length() - 1}): first {first:.1f} s,"
              f" warm {warm:.2f} s (verified)", flush=True)

    with open(os.path.join(os.path.dirname(__file__),
                           "big_proves_r3.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print("BIG-PROVES DONE", flush=True)


if __name__ == "__main__":
    main()
