"""Round-2 probe C: where does the COLD compile time of prove() go?

Runs one prove with a FRESH compilation cache and jax_log_compiles on,
logging every XLA compile with a timestamp; also times sub-steps of the
trace-lde phase (scan trace vs INTT vs NTT) and each fetch, to localize
both the cold cliff (VERDICT #3) and the warm 2^14 = 250 ms split.

Usage: STARK_TPU_COMPILE_CACHE=/tmp/cold_$$ python benches/probe_cold.py 14
Writes incremental output; run under nohup / run_in_background.
"""
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-compile log lines with timestamps
logging.basicConfig(
    level=logging.WARNING,
    stream=sys.stderr,
    format="%(asctime)s %(name)s %(message)s",
)

import jax

jax.config.update("jax_log_compiles", True)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.2f}s] {msg}", flush=True)


def main(log2_trace: int):
    from stark_tpu.config import DEFAULT_GENERATOR, DEFAULT_MODULUS, \
        ProverConfig
    from stark_tpu.stark.prover import prove
    from stark_tpu.utils.metrics import MetricsCollector

    cfg = ProverConfig(modulus=DEFAULT_MODULUS, generator=DEFAULT_GENERATOR,
                       log2_trace=log2_trace, blowup=8, num_queries=16)
    mark("start cold prove")
    mc = MetricsCollector()
    t0 = time.time()
    pr = prove(cfg, a1=3141592, metrics=mc)
    cold = time.time() - t0
    phases = {p["name"]: round(p["wall_s"], 2) for p in mc.to_dict()["phases"]}
    mark(f"cold prove done {cold:.2f}s phases={json.dumps(phases)}")

    # warm split with precise metrics
    mc2 = MetricsCollector()
    t0 = time.time()
    prove(cfg, a1=3141592, metrics=mc2)
    warm = time.time() - t0
    phases2 = {p["name"]: round(p["wall_s"], 4) for p in mc2.to_dict()["phases"]}
    mark(f"warm prove {warm:.3f}s phases={json.dumps(phases2)}")

    # sub-steps of trace-lde, warm
    import numpy as np

    from stark_tpu.ntt.ntt import coset_evaluate
    from stark_tpu.stark.trace import fibonacci_square_trace, trace_polynomial

    p = cfg.modulus
    for name, fn in (
        ("trace-scan", lambda: fibonacci_square_trace(p, cfg.trace_length)),
        ("trace-poly", lambda: trace_polynomial(
            fibonacci_square_trace(p, cfg.trace_length), p)),
        ("coset-eval", lambda: coset_evaluate(
            trace_polynomial(fibonacci_square_trace(p, cfg.trace_length), p),
            p, cfg.eval_domain_size, cfg.offset)),
    ):
        r = fn(); jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(3):
            r = fn()
        jax.block_until_ready(r)
        mark(f"warm {name} x3 = {time.time() - t0:.4f}s")

    # fetch latency right now
    x = jax.numpy.arange(8, dtype=jax.numpy.uint32)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(5):
        np.asarray(x[:1])
    mark(f"5 tiny fetches = {time.time() - t0:.3f}s")
    print("PROBE-C DONE", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 14)
