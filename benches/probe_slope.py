"""Slope timing: T(R2)-T(R1) / (R2-R1) cancels the ~30 ms fixed
dispatch+fetch latency of the tunneled device.  The loop is carried
(output feeds input) so XLA cannot elide iterations."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def slope_ms(core, x, r1=16, r2=96, tries=3):
    outs = {}
    for reps in (r1, r2):
        loop = jax.jit(lambda v, r=reps: lax.fori_loop(
            0, r, lambda i, a: core(a), v)[:1])
        np.asarray(loop(x))
        ts = []
        for _ in range(tries):
            t0 = time.time(); np.asarray(loop(x)); ts.append(time.time() - t0)
        outs[reps] = min(ts)
    return (outs[r2] - outs[r1]) / (r2 - r1) * 1e3

if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    from stark_tpu.ntt.pallas_ntt import _plan
    from stark_tpu.ntt.fourstep import get_fourstep_plan
    P = 3 * 2**30 + 1
    for logn in [int(s) for s in sys.argv[1].split(",")]:
        n = 1 << logn
        x = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(P)
        fs = get_fourstep_plan(P, n)
        ms_x = slope_ms(lambda v: fs._transform(v, fs._table, fs._tws1, fs._tws2), x)
        pp = _plan(P, n, False, False)
        ms_p = slope_ms(lambda v: pp._run(v, pp.table, pp.tws1, pp.tws2, pp.rev1, pp.rev2), x)
        hbm = 7 * n * 4 / 819e9 * 1e3
        print(f"2^{logn}: XLA {ms_x:.3f} ms | PALLAS {ms_p:.3f} ms | ~HBM-bound {hbm:.3f} ms", flush=True)
