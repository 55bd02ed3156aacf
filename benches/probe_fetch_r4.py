"""Warm-prove overhead attribution: transfers vs launches (r4).

The warm 2^14 single-fetch prove walls ~110 ms while its device compute
is microseconds-scale.  cProfile (probe_warmregress_r4.txt) puts ~105 ms
inside `jax.device_get` of the ONE fetch — a pytree of ~102 small u32
arrays.  Two distinct costs hide in there on the tunneled TPU:

  (a) per-array device->host transfers: each leaf may be its own RPC;
  (b) per-launch dispatch overhead: the prove dispatches ~50+ small
      programs (DeviceFS absorbs/draws, 14+ fused fold layers, tree
      levels) whose completion the first transfer waits on.

This probe measures each in isolation:

  1. device_get of K resident small arrays vs 1 packed array of the
     same total bytes -> per-leaf transfer cost;
  2. N chained tiny jit launches then one sync -> per-launch cost;
  3. the real prove fetch, split: block_until_ready on the device
     values first (isolates compute+dispatch), then device_get
     (isolates pure transfer).

Writes benches/probe_fetch_r4.txt.
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

OUT = "benches/probe_fetch_r4.txt"
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
import numpy as np

log(f"devices: {jax.devices()}")

# -- 1. K small transfers vs 1 packed ---------------------------------------
K = 102
shapes = [(16,), (16, 16, 8), (16, 2)] * (K // 3)
arrs = [jnp.asarray(np.arange(np.prod(s), dtype=np.uint32).reshape(s))
        for s in shapes]
jax.block_until_ready(arrs)
total_words = sum(int(np.prod(s)) for s in shapes)
packed = jnp.concatenate([a.reshape(-1) for a in arrs])
packed.block_until_ready()

for name, fetch in (("k-small", arrs), ("packed", packed)):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(fetch)
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"device_get {name} ({K} leaves, {total_words * 4} B): "
        f"min {min(ts):.1f} ms median {statistics.median(ts):.1f} "
        f"(runs {', '.join(f'{t:.0f}' for t in ts)})")

# -- 2. per-launch dispatch cost --------------------------------------------
f = jax.jit(lambda v: v + 1)
x = jnp.zeros((8,), jnp.uint32)
f(x).block_until_ready()
for n in (1, 10, 50):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = f(y)
        y.block_until_ready()
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"{n} chained tiny launches + sync: min {min(ts):.1f} ms "
        f"median {statistics.median(ts):.1f}")

# -- 3. the real prove, fetch split -----------------------------------------
from stark_tpu import ProverConfig
from stark_tpu.stark import prove

cfg = ProverConfig(log2_trace=14, blowup=4, num_queries=16)
t0 = time.perf_counter()
prove(cfg)
log(f"first prove (compiles): {time.perf_counter() - t0:.1f} s")

from stark_tpu.utils import packfetch

orig_get = packfetch.device_get_packed
split = {}


def timed_get(tree):
    t_a = time.perf_counter()
    jax.block_until_ready(tree)
    t_b = time.perf_counter()
    out = orig_get(tree)
    t_c = time.perf_counter()
    leaves = jax.tree.leaves(tree)
    split["compute_wait_ms"] = (t_b - t_a) * 1e3
    split["transfer_ms"] = (t_c - t_b) * 1e3
    split["n_leaves"] = len(leaves)
    split["bytes"] = sum(l.size * l.dtype.itemsize for l in leaves)
    return out


for trial in range(5):
    # the prover resolves packfetch.device_get_packed at call time —
    # patch the module attribute to time the (packed) single fetch
    packfetch.device_get_packed = timed_get
    try:
        t0 = time.perf_counter()
        prove(cfg)
        wall = (time.perf_counter() - t0) * 1e3
    finally:
        packfetch.device_get_packed = orig_get
    log(f"prove run {trial}: wall {wall:.1f} ms = pre-fetch "
        f"{wall - split['compute_wait_ms'] - split['transfer_ms']:.1f} "
        f"+ compute-wait {split['compute_wait_ms']:.1f} "
        f"+ transfer {split['transfer_ms']:.1f} ms "
        f"({split['n_leaves']} leaves, {split['bytes']} B)")

log("PROBE-FETCH DONE")
