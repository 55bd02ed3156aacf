#!/bin/bash
# Poll the wedged TPU tunnel with short-lived canary subprocesses; when it
# answers, run the round-2 probe sequence, each stage under its own
# timeout with incremental output files.  Never kills by pattern — each
# stage is a direct child with its own timeout.
set -u
cd /root/repo
LOG=benches/pipeline.log
echo "=== pipeline start $(date) ===" >>"$LOG"

canary() {
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jax.jit(lambda v: v*2+1)(jnp.ones(8, jnp.uint32))
assert int(np.asarray(x)[0]) == 3
print('CANARY-OK')" 2>/dev/null | grep -q CANARY-OK
}

for i in $(seq 1 100); do
  if canary; then
    echo "tunnel up after poll $i $(date)" >>"$LOG"
    break
  fi
  echo "poll $i: tunnel down $(date)" >>"$LOG"
  sleep 240
done

if ! canary; then
  echo "GAVE UP waiting for tunnel $(date)" >>"$LOG"
  exit 1
fi

# stage 1: fused-layer pinpoint (fresh cache inside the script)
echo "--- probe_fuse $(date)" >>"$LOG"
timeout 2400 python benches/probe_fuse.py >benches/probe_fuse.txt 2>/dev/null
echo "probe_fuse exit=$? $(date)" >>"$LOG"
sleep 90

# stage 2: cold prove breakdown with fresh cache (current code)
echo "--- probe_cold $(date)" >>"$LOG"
STARK_TPU_COMPILE_CACHE=/tmp/cold3_$$ timeout 2400 \
  python benches/probe_cold.py 14 >benches/probe_cold14c.txt 2>/dev/null
echo "probe_cold exit=$? $(date)" >>"$LOG"
sleep 90

# stage 3: pallas NTT probe (warm persistent cache fine)
echo "--- probe_pallas2 $(date)" >>"$LOG"
timeout 2400 python benches/probe_pallas2.py >benches/probe_pallas2.txt 2>/dev/null
echo "probe_pallas2 exit=$? $(date)" >>"$LOG"

echo "=== pipeline done $(date) ===" >>"$LOG"
