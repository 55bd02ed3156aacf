"""Round-2 probe B: (1) radix-4 XLA four-step NTT in-jit times,
(2) warm prove with the Pallas SHA chain query phase (mode auto=1 on
TPU), per-phase split.  Incremental prints; run under nohup."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def probe_ntt():
    from stark_tpu.ntt.fourstep import get_fourstep_plan

    P = 3 * 2**30 + 1
    for logn in (20, 22, 23, 24):
        n = 1 << logn
        plan = get_fourstep_plan(P, n, False)
        x = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(P)
        reps = 30

        @jax.jit
        def loop(v):
            return lax.fori_loop(0, reps, lambda i, a: plan(a), v)

        t0 = time.time()
        r = loop(x); r.block_until_ready()
        comp = time.time() - t0
        t0 = time.time()
        r = loop(x); r.block_until_ready()
        ms = (time.time() - t0) / reps * 1e3
        gbs = 2 * n * 4 / ms / 1e6
        print(f"NTT-r4 logn={logn} {ms:.3f} ms  {gbs:.0f} GB/s(in+out) "
              f"compile={comp:.1f}s", flush=True)


def probe_prove(log2_trace: int):
    from stark_tpu.config import DEFAULT_GENERATOR, DEFAULT_MODULUS, \
        ProverConfig
    from stark_tpu.stark.prover import prove
    from stark_tpu.stark.verifier import verify
    from stark_tpu.utils.metrics import MetricsCollector

    cfg = ProverConfig(modulus=DEFAULT_MODULUS, generator=DEFAULT_GENERATOR,
                       log2_trace=log2_trace, blowup=8, num_queries=16)
    t0 = time.time()
    pr = prove(cfg, a1=3141592)
    cold = time.time() - t0
    print(f"prove log2={log2_trace} cold={cold:.2f}s", flush=True)
    assert verify(pr, expected_config=cfg)
    warm = []
    for _ in range(3):
        t0 = time.time()
        pr = prove(cfg, a1=3141592)
        warm.append(round(time.time() - t0, 3))
    print(f"prove log2={log2_trace} warm={warm}", flush=True)
    mc = MetricsCollector()
    prove(cfg, a1=3141592, metrics=mc)
    phases = {p["name"]: round(p["wall_s"], 4)
              for p in mc.to_dict()["phases"]}
    print(json.dumps({"log2_trace": log2_trace, "cold_s": round(cold, 2),
                      "warm_s": warm, "phases": phases}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ntt"):
        probe_ntt()
    if which in ("all", "prove"):
        probe_prove(14)
        probe_prove(18)
    print("PROBE-B DONE", flush=True)
