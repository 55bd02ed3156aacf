#!/bin/bash
# Companion to tpu_recovery_pipeline.sh: wait for it to finish, then run
# the full benchmark so benches/latest.json + the persistent compile
# cache are fresh for the round-end bench.  Detached-safe.
set -u
cd /root/repo
LOG=benches/pipeline.log
echo "=== post-bench waiter start $(date) ===" >>"$LOG"
for i in $(seq 1 200); do
  if grep -q "pipeline done" "$LOG" 2>/dev/null; then
    break
  fi
  sleep 240
done
if ! grep -q "pipeline done" "$LOG"; then
  echo "post-bench: gave up waiting $(date)" >>"$LOG"
  exit 1
fi
echo "--- probe_marginal $(date)" >>"$LOG"
timeout 1800 python benches/probe_marginal.py 20,22 \
  >benches/probe_marginal.txt 2>benches/probe_marginal.err
echo "probe_marginal exit=$? $(date)" >>"$LOG"
sleep 60
echo "--- bench full $(date)" >>"$LOG"
timeout 3000 python bench.py --full-prove \
  >benches/bench_stdout.txt 2>benches/bench_stderr.txt
echo "bench exit=$? $(date)" >>"$LOG"
