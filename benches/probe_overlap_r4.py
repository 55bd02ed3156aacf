"""Engineered-overlap measurement (VERDICT r3 item 9, the PP row).

BENCH_r03 reported "async-dispatch saving (upper bound): 119.8 ms, 52%"
— the gap between the SYNCED per-phase sum and the async warm wall.
That gap mixes two effects:

  (a) avoided per-phase syncs — each forced block_until_ready costs a
      tunnel round trip (~10-30 ms);
  (b) true device-side pipelining — phase k+1 compute overlapping
      phase k.

This probe separates them: it measures the warm wall (min-of-N), the
synced phase sum, and the bare sync cost (median of tiny fetches), then
computes

  true_overlap = phase_sum - n_syncs * sync_cost - wall

On a single TPU there is one compute stream AND the Fiat-Shamir chain
serializes every phase (alphas depend on the trace root; beta_k on layer
k-1's root; query q+1's index on query q's openings — reference:
fri_commit.rs:89-101, 168-179), so the expected true overlap is ~zero:
the "saving" is avoided sync latency, and the PP row's honest ceiling on
one chip is the dependency chain itself.  Cross-phase double-buffering
(e.g. Merkle level k against fold k+1) would REORDER transcript
dependencies and change the proof — it is not legal, not merely
unprofitable.  Writes benches/probe_overlap_r4.txt.
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

OUT = "benches/probe_overlap_r4.txt"
t_start = time.perf_counter()
lines = []


def log(msg):
    el = time.perf_counter() - t_start
    line = f"[{el:8.2f}s] {msg}"
    print(line, flush=True)
    lines.append(line)
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")


import jax
import jax.numpy as jnp

from stark_tpu import ProverConfig
from stark_tpu.stark import prove
from stark_tpu.utils.metrics import MetricsCollector

log(f"devices: {jax.devices()}")
cfg = ProverConfig(log2_trace=14, blowup=4, num_queries=16)

# warm everything
t0 = time.perf_counter()
prove(cfg)
log(f"first prove (compiles): {time.perf_counter() - t0:.1f} s")

# 1. async warm wall, min of 9
ts = []
for _ in range(9):
    t0 = time.perf_counter()
    prove(cfg)
    ts.append((time.perf_counter() - t0) * 1e3)
wall = min(ts)
log(f"async wall: min {wall:.1f} ms  median {statistics.median(ts):.1f} "
    f"(runs {', '.join(f'{t:.0f}' for t in ts)})")

# 2. synced phase split, 3 runs, min per phase
splits = []
for _ in range(3):
    mx = MetricsCollector()
    prove(cfg, metrics=mx)
    splits.append({p["name"]: p["wall_s"] * 1e3
                   for p in mx.to_dict()["phases"]})
phases = {k: min(s[k] for s in splits) for k in splits[0]}
phase_sum = sum(phases.values())
n_syncs = len(phases)
for k, v in phases.items():
    log(f"  phase {k}: {v:.1f} ms (min of 3)")
log(f"synced phase sum: {phase_sum:.1f} ms over {n_syncs} syncs")

# 3. bare sync cost: dispatch a trivial op and block on it
tiny = jnp.zeros((8,), jnp.uint32)
f = jax.jit(lambda v: v + 1)
f(tiny).block_until_ready()
sync_ts = []
for _ in range(20):
    t0 = time.perf_counter()
    f(tiny).block_until_ready()
    sync_ts.append((time.perf_counter() - t0) * 1e3)
sync_cost = statistics.median(sync_ts)
log(f"bare dispatch+sync cost: median {sync_cost:.1f} ms "
    f"(min {min(sync_ts):.1f}, max {max(sync_ts):.1f})")

# 4. attribution
avoided = n_syncs * sync_cost
true_overlap = phase_sum - avoided - wall
log(f"attribution: phase_sum {phase_sum:.1f} = wall {wall:.1f} "
    f"+ avoided syncs ~{avoided:.1f} ({n_syncs} x {sync_cost:.1f}) "
    f"+ true overlap ~{true_overlap:.1f} ms")
log("conclusion: " + (
    f"true device-side overlap ~{true_overlap:.0f} ms "
    f"({100 * true_overlap / max(phase_sum, 1e-9):.0f}% of phase sum); "
    "the rest of the r3 'async saving' was avoided tunnel syncs."
    if true_overlap > 5 else
    "no material device-side overlap — the async saving is avoided "
    "tunnel syncs; Fiat-Shamir serializes every phase (alphas <- trace "
    "root, beta_k <- root_{k-1}, idx_{q+1} <- openings_q), so "
    "cross-phase double-buffering would change the transcript and is "
    "not legal on this protocol."))
log("PROBE-OVERLAP DONE")
