"""Wide-field (Goldilocks) mega viability — r5 task 6/3.

r4 gated wide mega off: ~55 s warm-cache load per process for ~5 ms of
warm-wall gain.  r5 shrank the context tables (rolled Fermat inverse)
and added per-phase chain breaks; this probe re-measures both sides of
the trade in one fresh process per arm:
  arm A: wide mega ON  (default now) — first + warm walls
  arm B: wide mega OFF (STARK_TPU_NO_WIDE_MEGA=1) — first + warm walls
Writes benches/probe_widemega_r5.txt.
"""
import os, subprocess, sys, time
sys.path.insert(0, ".")

OUT = "benches/probe_widemega_r5.txt"
lines = []
def log(msg):
    print(msg, flush=True)
    lines.append(msg)
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")

ARM_SRC = """
import sys, time; sys.path.insert(0, '.')
from stark_tpu import ProverConfig
from stark_tpu.stark import prove, verify
from stark_tpu.stark import prover as prover_mod
cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                   log2_trace=10, blowup=4, num_queries=16)
t0 = time.perf_counter()
pf = prove(cfg)
first = time.perf_counter() - t0
ok = verify(pf)
walls = []
for _ in range(9):
    t0 = time.perf_counter(); prove(cfg); walls.append(time.perf_counter() - t0)
walls.sort()
print(f"ARM path={prover_mod.LAST_PROVE_PATH} first={first:.1f}s "
      f"warm_min={walls[0]*1e3:.0f}ms warm_med={walls[4]*1e3:.0f}ms "
      f"verified={ok}", flush=True)
"""

for name, env in (("wide-mega-ON", {}),
                  ("wide-mega-OFF", {"STARK_TPU_NO_WIDE_MEGA": "1"})):
    e = dict(os.environ); e.update(env)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-c", ARM_SRC], env=e,
                       capture_output=True, text=True, timeout=1800)
    for ln in (r.stdout or "").splitlines():
        if ln.startswith("ARM"):
            log(f"{name}: {ln[4:]} (subprocess wall "
                f"{time.perf_counter()-t0:.1f}s)")
    if r.returncode != 0:
        log(f"{name}: FAILED rc={r.returncode}: {(r.stderr or '')[-300:]}")
log("PROBE-WIDEMEGA DONE")
