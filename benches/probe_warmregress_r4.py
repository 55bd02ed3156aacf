"""Diagnose the r3 warm-prove regression (VERDICT r3 task 2).

BENCH_r02: prove 2^14 warm 96 ms, mimc3 2^12 warm 91 ms.
BENCH_r03: 110 ms / 117 ms — yet r3's SYNCED phase split is FASTER than
r2's (229 vs 248 ms).  So the growth is in (a) the async single-fetch
wall, (b) host-side Python/replay overhead, or (c) tunnel per-run drift
that a 3-run median can't reject.

This probe: distribution over 15 runs, host-profile of one warm prove,
and the single device_get cost.  Writes benches/probe_warmregress_r4.txt.
"""

import sys
import time

sys.path.insert(0, ".")

OUT = "benches/probe_warmregress_r4.txt"
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
from stark_tpu.stark import prove
from stark_tpu.stark.air import MimcAIR

import jax

log(f"devices: {jax.devices()}")

cfg = ProverConfig(log2_trace=14, blowup=4, num_queries=16)
mcfg = ProverConfig(log2_trace=12, blowup=4, num_queries=16)

# warmups (compile)
t0 = time.perf_counter()
prove(cfg)
log(f"prove 2^14 first: {time.perf_counter()-t0:.1f} s")
t0 = time.perf_counter()
prove(mcfg, air=MimcAIR(x0=271828))
log(f"mimc3 2^12 first: {time.perf_counter()-t0:.1f} s")

for name, fn in (
    ("prove2e14", lambda: prove(cfg)),
    ("mimc3_2e12", lambda: prove(mcfg, air=MimcAIR(x0=271828))),
):
    fn()  # warm
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts_s = sorted(ts)
    log(f"{name}: runs = {', '.join(f'{t:.0f}' for t in ts)} ms")
    log(f"{name}: min {ts_s[0]:.1f}  median {ts_s[7]:.1f}  "
        f"max {ts_s[-1]:.1f} ms")

# host-side profile of one warm prove: where does Python time go?
import cProfile
import io
import pstats

pr = cProfile.Profile()
pr.enable()
prove(cfg)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(30)
for ln in s.getvalue().splitlines()[:45]:
    log("PROF " + ln)

log("PROBE-WARMREGRESS DONE")
