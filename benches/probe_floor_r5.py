"""Warm-2^14 tunnel-floor derivation — r5 task 8 (close the <=96 ms
target honestly: hit it or derive the floor and re-base).

Decomposes the mega-path warm prove into its irreducible parts measured
IN-SESSION:
  RTT           one tiny jit + 4-byte fetch
  dispatch+compute  mega launch chain synced by a 4-byte fetch
  packed fetch  the real proof payload transfer
  host replay   transcript reconstruction (pure host)
Floor model: wall >= dispatch/compute-wait + fetch(RTT + payload/BW) +
host replay.  Writes benches/probe_floor_r5.txt.
"""
import os, sys, time, statistics
sys.path.insert(0, ".")

OUT = "benches/probe_floor_r5.txt"
lines = []
def log(msg):
    print(msg, flush=True)
    lines.append(msg)
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")

import jax, jax.numpy as jnp, numpy as np
from stark_tpu import ProverConfig
from stark_tpu.stark import prove, verify
from stark_tpu.stark import prover as prover_mod

dev = jax.devices()[0]
log(f"device: {dev}")

# RTT
step = jax.jit(lambda v: v + 1)
x8 = jax.device_put(jnp.ones(8, jnp.uint32), dev)
np.asarray(step(x8))[:1]
rtts = []
for _ in range(15):
    t0 = time.perf_counter(); _ = np.asarray(step(x8))[:1]
    rtts.append(time.perf_counter() - t0)
rtt = min(rtts)
log(f"RTT (tiny jit + 4B fetch): {rtt*1e3:.1f} ms min, "
    f"median {statistics.median(rtts)*1e3:.1f}")

# upload/fetch bandwidth
h16 = np.arange(1 << 22, dtype=np.uint32)
xb = jax.device_put(h16, dev); np.asarray(xb[:1])
t0 = time.perf_counter(); hb = np.asarray(xb); t_fetch16 = time.perf_counter() - t0
log(f"device->host 16 MB fetch: {t_fetch16*1e3:.0f} ms = {16/t_fetch16:.1f} MB/s")

cfg = ProverConfig(log2_trace=14, blowup=4, num_queries=16)
pf = prove(cfg)   # warm everything
assert verify(pf)
log(f"prove path: {prover_mod.LAST_PROVE_PATH}")

# full warm wall, min of 9
walls = []
for _ in range(9):
    t0 = time.perf_counter(); prove(cfg); walls.append(time.perf_counter() - t0)
walls.sort()
log(f"warm prove 2^14 wall: {walls[0]*1e3:.0f} ms min "
    f"(median {walls[4]*1e3:.0f}; all {[round(w*1e3) for w in walls]})")

# phase split of the mega path: _prove_mega times prove-device vs
# fetch-replay on the GLOBAL collector when metrics=None (a precise
# MetricsCollector would force the per-phase path and skip mega)
from stark_tpu.utils import metrics as metrics_mod

def mega_split():
    g = metrics_mod.GLOBAL
    n0 = len(g.phases)
    prove(cfg)
    return {ph.name: ph.wall_s for ph in g.phases[n0:]}

splits = [mega_split() for _ in range(5)]
for name in ("trace-lde", "prove-device", "fetch-replay"):
    vals = [s[name] for s in splits if name in s]
    if vals:
        log(f"  phase {name}: {min(vals)*1e3:.1f} ms min "
            f"(median {sorted(vals)[len(vals)//2]*1e3:.1f})")

# payload size of the packed fetch ~ proof bytes
sz = pf.size_bytes()
bw_mb_s = 16 / t_fetch16
payload_ms = sz / (bw_mb_s * 1e6) * 1e3
log(f"proof transcript {sz} B -> payload transfer ~{payload_ms:.1f} ms "
    f"at measured {bw_mb_s:.0f} MB/s")
log(f"floor = 2 RTT ({2*rtt*1e3:.1f}) + payload ({payload_ms:.1f}) "
    f"= {2*rtt*1e3 + payload_ms:.1f} ms + device compute + host replay; "
    "compare against the phase split above")
log("PROBE-FLOOR DONE")
