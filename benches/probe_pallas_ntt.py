"""Probe Mosaic compile behavior of the Pallas NTT size-by-size.

Appends one line per size to benches/probe_pallas_results.txt (and
stdout): compile seconds, correctness vs the XLA plan, warm ms, or
TIMEOUT.  Each size runs in its own subprocess so a hang on one size
doesn't block the rest (and the tunnel client dies with the subprocess).
"""
import os
import subprocess
import sys
import time

SIZES = [int(s) for s in (sys.argv[1:] or range(14, 23))]
PER_SIZE_TIMEOUT = 420  # s
OUT = os.path.join(os.path.dirname(__file__), "probe_pallas_results.txt")

CHILD = r"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from stark_tpu.ntt.pallas_ntt import pallas_ntt
from stark_tpu.ntt.fourstep import get_fourstep_plan

logn = int(sys.argv[1])
p = 3 * 2**30 + 1
n = 1 << logn
x = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(p)
t0 = time.time()
y = pallas_ntt(x, p)
y.block_until_ready()
t1 = time.time()
ref = get_fourstep_plan(p, n, False)(x)
ok = bool(jnp.array_equal(y, ref))
def chain(fn, v):
    for _ in range(10):
        v = fn(v, p) if fn is pallas_ntt else fn(v)
    return v
r = chain(pallas_ntt, x); r.block_until_ready()
t2 = time.time()
r = chain(pallas_ntt, x); r.block_until_ready()
t3 = time.time()
xf = get_fourstep_plan(p, n, False)
r = chain(xf, x); r.block_until_ready()
t4 = time.time()
r = chain(xf, x); r.block_until_ready()
t5 = time.time()
print(f"RESULT logn={logn} compile={t1-t0:.1f}s ok={ok} "
      f"pallas={(t3-t2)/10*1000:.3f}ms xla={(t5-t4)/10*1000:.3f}ms",
      flush=True)
"""


def emit(line: str) -> None:
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


emit(f"--- probe run {time.strftime('%H:%M:%S')} sizes={SIZES}")
for logn in SIZES:
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(logn)],
            capture_output=True, text=True, timeout=PER_SIZE_TIMEOUT,
            cwd="/root/repo",
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                emit(line)
                break
        else:
            emit(f"RESULT logn={logn} FAILED rc={out.returncode} "
                 f"err={out.stderr[-300:]!r}")
    except subprocess.TimeoutExpired:
        emit(f"RESULT logn={logn} TIMEOUT>{PER_SIZE_TIMEOUT}s")
    # let the tunnel settle between clients
    time.sleep(15)
emit("PROBE DONE")
