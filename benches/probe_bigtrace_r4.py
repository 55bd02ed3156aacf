"""Big-trace prove ladder, round 4: 2^18..2^24 rows with PRUNED Merkle
digest storage (merkle/tree.py PRUNE_KEEP_LOG) — the r4 first attempt
OOMed at 2^24 because ~12 GB of digest levels (LDE 2^26) exceeded the
v5e's HBM; pruning bounds retained digests per tree at ~64 MB and the
device query program recomputes each path's missing siblings from the
leaf values (channel/device_query._subtree_sibs).

2^26 rows (LDE 2^28, 1 GB values) is attempted as a stretch entry; a
per-size failure is recorded without aborting the remaining sizes.

Writes benches/probe_bigtrace_r4.txt.  Run: python benches/probe_bigtrace_r4.py
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

OUT = "benches/probe_bigtrace_r4.txt"
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
from stark_tpu.merkle.tree import PRUNE_KEEP_LOG, prune_depth_for
from stark_tpu.stark import prove, verify

import jax

log(f"devices: {jax.devices()}  PRUNE_KEEP_LOG={PRUNE_KEEP_LOG}")

for log2_tr in (18, 20, 22, 24, 26):
    cfg = ProverConfig(log2_trace=log2_tr, blowup=4, num_queries=16)
    lde = 1 << (log2_tr + 2)
    t0 = time.perf_counter()
    try:
        pf = prove(cfg)
    except Exception as e:  # publish the sizes that DID run
        log(f"2^{log2_tr} rows FAILED after {time.perf_counter()-t0:.1f} s: "
            f"{type(e).__name__}: {str(e)[:200]}")
        continue
    cold = time.perf_counter() - t0
    log(f"2^{log2_tr} rows cold (compiles): {cold:.1f} s "
        f"(trace-tree prune depth {prune_depth_for(lde)})")
    ts = []
    for _ in range(3 if log2_tr < 24 else 2):
        t0 = time.perf_counter()
        prove(cfg)
        ts.append(time.perf_counter() - t0)
    warm = statistics.median(ts)
    ok = verify(pf)
    log(f"2^{log2_tr} rows warm: {warm*1e3:.0f} ms (runs: "
        f"{', '.join(f'{t*1e3:.0f}' for t in sorted(ts))} ms) verified={ok}")
    assert ok

log("PROBE-BIGTRACE-R4 DONE")
