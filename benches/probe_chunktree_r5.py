"""Chunked-subtree-hashing probe: can 2^25/2^26-row proves fit one chip
once the big pruned trees stop materializing their dropped levels?

The r5 ladder OOMed at 2^25 rows (LDE 2^27) — accounting pinned the
transient leaf-digest levels (probe_bigtrace_r5.txt).  The chunked build
(merkle/tree.py build_levels_chunked_fn, routed >= 2^27 leaves)
sequentialises exactly that transient.  min-of-3 warm walls on success;
memory_stats + failure accounting otherwise.

Writes benches/probe_chunktree_r5.txt.  Run: python benches/probe_chunktree_r5.py
"""
import sys, time
sys.path.insert(0, ".")

OUT = "benches/probe_chunktree_r5.txt"
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
from stark_tpu.merkle.tree import PRUNE_KEEP_LOG, _CHUNK_MIN_LOG, prune_depth_for
from stark_tpu.stark import prove, verify
import jax


def mem():
    try:
        s = jax.devices()[0].memory_stats()
        return (f"in_use {s.get('bytes_in_use',0)/2**30:.2f} GiB, "
                f"peak {s.get('peak_bytes_in_use',0)/2**30:.2f} GiB")
    except Exception as e:
        return f"(memory_stats unavailable: {e})"


log(f"devices: {jax.devices()}  PRUNE_KEEP_LOG={PRUNE_KEEP_LOG} "
    f"CHUNK_MIN_LOG={_CHUNK_MIN_LOG}")

for log2_tr in (25, 26):
    cfg = ProverConfig(log2_trace=log2_tr, blowup=4, num_queries=16)
    lde = 1 << (log2_tr + 2)
    log(f"2^{log2_tr} rows: LDE 2^{log2_tr+2}, trace-tree prune depth "
        f"{prune_depth_for(lde)}, chunked={lde >= (1 << _CHUNK_MIN_LOG)}")
    t0 = time.perf_counter()
    try:
        pf = prove(cfg)
    except Exception as e:
        log(f"2^{log2_tr} rows FAILED after {time.perf_counter()-t0:.1f} s: "
            f"{type(e).__name__}: {str(e)[:400]}")
        log(f"  mem at failure: {mem()}")
        continue
    cold = time.perf_counter() - t0
    log(f"2^{log2_tr} rows cold (compiles): {cold:.1f} s; mem {mem()}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        prove(cfg)
        ts.append(time.perf_counter() - t0)
    ok = verify(pf)
    log(f"2^{log2_tr} rows warm: {min(ts)*1e3:.0f} ms min of "
        f"{[round(t*1e3) for t in sorted(ts)]} verified={ok}; mem {mem()}")

log("PROBE-CHUNKTREE-R5 DONE")
