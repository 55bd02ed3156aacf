"""Measured virtual-mesh scaling vs the analytic comm model (VERDICT r3
item 5): run the sharded prove at 1/2/4/8 virtual CPU devices, record
wall times and the compiled dist-NTT collective counts, and write them
NEXT TO dist/comm.py's roofline projection in benches/scaling.json.

CPU wall time is NOT ICI time — the point is the trend and regression
coverage for the collective path, which the byte-identity tests cannot
see (a 10x-slower all_to_all lowering would still be byte-identical).

Run:  python benches/probe_scaling.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

from stark_tpu.config import ProverConfig  # noqa: E402
from stark_tpu.dist import comm, make_mesh  # noqa: E402
from stark_tpu.stark import prove  # noqa: E402

LOG2_TRACE, BLOWUP, QUERIES = 10, 4, 8
REPS = 7


def _collective_counts(n: int, s: int) -> dict:
    """Collective ops in the compiled sharded forward NTT at size n."""
    if s == 1:
        return {}
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.config import DEFAULT_MODULUS as P
    from stark_tpu.dist.ntt import _dist_plan

    mesh = make_mesh(s, devices=jax.local_devices(backend="cpu")[:s])
    plan = _dist_plan(P, n, s, False)
    x = jnp.asarray(np.zeros(n, dtype=np.uint32))
    fn = jax.jit(lambda v: plan.run(v, mesh))
    txt = fn.lower(x).compile().as_text()
    return comm.count_hlo_kinds(txt)


def main():
    cfg = ProverConfig(log2_trace=LOG2_TRACE, blowup=BLOWUP,
                       num_queries=QUERIES)
    devices = jax.local_devices(backend="cpu")
    measured = []
    for s in (1, 2, 4, 8):
        mesh = None if s == 1 else make_mesh(s, devices=devices[:s])
        prove(cfg, mesh=mesh)  # compile + warm
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            prove(cfg, mesh=mesh)
            ts.append(time.perf_counter() - t0)
        row = {
            "devices": s,
            "warm_min_ms": min(ts) * 1e3,
            "warm_median_ms": statistics.median(ts) * 1e3,
            "collectives_ntt": _collective_counts(cfg.eval_domain_size, s),
        }
        measured.append(row)
        print(f"devices={s}: min {row['warm_min_ms']:.1f} ms  "
              f"median {row['warm_median_ms']:.1f} ms  "
              f"collectives {row['collectives_ntt']}", flush=True)

    report = comm.scaling_report(log2_trace=LOG2_TRACE, blowup=BLOWUP,
                                 device_counts=(1, 2, 4, 8))
    out = {
        "note": ("measured = virtual CPU mesh wall (trend/regression "
                 "coverage for the collective path, NOT ICI timing); "
                 "model = dist/comm.py ICI roofline at the same shape"),
        "config": {"log2_trace": LOG2_TRACE, "blowup": BLOWUP,
                   "num_queries": QUERIES, "reps": REPS},
        "measured": measured,
        "model": report,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
