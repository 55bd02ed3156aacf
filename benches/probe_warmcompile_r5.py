"""Where does a WARM-CACHE first prove spend its time? (r5 task 3)

Runs one prove(2^14) in this process with persistent-cache debug logging
on, and separately times trace/lower vs compile for the heaviest jobs.
"""
import logging, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_imp0 = time.perf_counter()
import jax
from stark_tpu.config import ProverConfig
print(f"import+config: {time.perf_counter()-t_imp0:.1f} s", flush=True)

for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    h = logging.StreamHandler(sys.stdout)
    h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
    lg.addHandler(h)

from stark_tpu.stark import prove
cfg = ProverConfig(log2_trace=14, blowup=4, num_queries=16)
t0 = time.perf_counter()
pf = prove(cfg)
print(f"PROVE14 first: {time.perf_counter()-t0:.1f} s", flush=True)
from stark_tpu.utils import progcache, prewarm
print("progcache events:", dict(progcache.LAST_EVENTS), flush=True)
jobs = sorted(prewarm.LAST_JOB_WALLS.items(), key=lambda kv: -kv[1])[:8]
print("prewarm walls:", {k: round(v,1) for k,v in jobs}, flush=True)
t0 = time.perf_counter()
pf = prove(cfg)
print(f"PROVE14 second (same process): {time.perf_counter()-t0:.3f} s", flush=True)
