"""Big-trace prove ladder (VERDICT r2 task 5): re-measure 2^18..2^24-row
proves with the round-3 machinery (single-fetch query phase, bitrev
Pallas Merkle, prewarmed compiles, radix-4 XLA NTT above the Pallas cap).

The round-1 README table (2^18 = 1.02 s, 2^24 = 21.4 s warm) predated all
of that; this probe replaces it with fresh measurements.  Writes
benches/probe_bigtrace_r3.txt and prints the table.

Run on the tunneled TPU:  python benches/probe_bigtrace_r3.py
"""

import sys
import time

sys.path.insert(0, ".")

OUT = "benches/probe_bigtrace_r3.txt"
t_start = time.perf_counter()
lines = []


def log(msg):
    el = time.perf_counter() - t_start
    line = f"[{el:8.2f}s] {msg}"
    print(line, flush=True)
    lines.append(line)
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")


from stark_tpu import ProverConfig
from stark_tpu.stark import prove, verify

import jax

log(f"devices: {jax.devices()}")

# Same shape family as the round-1 table: the flagship square AIR,
# blowup 4, 16 queries, trace rows swept 2^18 -> 2^24 (LDE 2^20 -> 2^26).
for log2_tr in (18, 20, 22, 24):
    cfg = ProverConfig(log2_trace=log2_tr, blowup=4, num_queries=16)
    t0 = time.perf_counter()
    try:
        pf = prove(cfg)
    except Exception as e:  # publish the sizes that DID run
        log(f"2^{log2_tr} rows FAILED after {time.perf_counter()-t0:.1f} s: "
            f"{type(e).__name__}: {str(e)[:200]}")
        continue
    cold = time.perf_counter() - t0
    log(f"2^{log2_tr} rows cold (compiles): {cold:.1f} s")
    import statistics

    ts = []
    for _ in range(3 if log2_tr < 24 else 2):
        t0 = time.perf_counter()
        prove(cfg)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    warm = statistics.median(ts)  # true median (2-run case averages)
    ok = verify(pf)
    log(f"2^{log2_tr} rows warm: {warm*1e3:.0f} ms (runs: "
        f"{', '.join(f'{t*1e3:.0f}' for t in ts)} ms) verified={ok}")
    assert ok

log("PROBE-BIGTRACE DONE")
