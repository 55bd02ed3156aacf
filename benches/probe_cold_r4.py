"""Cold-start breakdown (VERDICT r3 item 3, third asking).

Measures the three target numbers — prove 2^14 first, FRI 2^18 first,
Goldilocks 2^10 first — each in a FRESH subprocess, twice:

  warm-cache:  default persistent .jax_cache (what the driver's bench
               run sees when the cache was populated by a prior run of
               the same code)
  true-cold:   STARK_TPU_COMPILE_CACHE pointed at an empty dir (a fresh
               machine)

and records the per-compile-job walls from utils.prewarm.LAST_JOB_WALLS
so the irreducible seconds are attributable program by program.

Run:  python benches/probe_cold_r4.py            # orchestrates everything
      python benches/probe_cold_r4.py <target>   # one target, this process
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_cold_r4.txt")
TARGETS = ("prove14", "fri18", "goldilocks10")


def run_target(name: str) -> None:
    t_import = time.perf_counter()
    from stark_tpu import ProverConfig
    from stark_tpu.utils import prewarm

    import jax

    jax.devices()  # backend init
    t0 = time.perf_counter()
    result = {"target": name, "import_backend_s": t0 - t_import}

    if name == "prove14":
        from stark_tpu.stark import prove, verify

        cfg = ProverConfig(log2_trace=14, blowup=4, num_queries=16)
        pf = prove(cfg)
        result["first_s"] = time.perf_counter() - t0
        assert verify(pf)
    elif name == "goldilocks10":
        from stark_tpu.stark import prove, verify

        cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                           log2_trace=10, blowup=4, num_queries=16)
        pf = prove(cfg)
        result["first_s"] = time.perf_counter() - t0
        assert verify(pf)
    else:  # fri18 — bench.py's exact FRI section
        from stark_tpu.channel import Channel
        from stark_tpu.config import DEFAULT_MODULUS as P
        from stark_tpu.fri import decommit_fri, fri_commit
        from stark_tpu.ntt import coset_evaluate
        from stark_tpu.utils.prewarm import prewarm_fri
        import jax.numpy as jnp

        log_deg, blowup = 18, 8
        coeffs = jnp.zeros((1 << log_deg,), jnp.uint32)
        t_nt = time.perf_counter()
        cw = coset_evaluate(coeffs, P, blowup << log_deg, 5)
        cw.block_until_ready()
        result["coset_evaluate_s"] = time.perf_counter() - t_nt
        t_pw = time.perf_counter()
        # lde_deg: cover the FULL bench path (LDE + channel + decommit
        # query program) in the parallel pool, exactly like bench.py
        prewarm_fri(P, blowup << log_deg, log_deg, 5, lde_deg=log_deg)
        result["prewarm_s"] = time.perf_counter() - t_pw
        t_fr = time.perf_counter()
        ch = Channel(P)
        pr = fri_commit(cw, P, 5, ch, num_folds=log_deg)
        decommit_fri(16, (blowup << log_deg) - 1, pr.fri_layers,
                     pr.fri_merkles, ch)
        result["fri_run_s"] = time.perf_counter() - t_fr
        result["first_s"] = time.perf_counter() - t0

    result["prewarm_jobs"] = {
        k: round(v, 1) for k, v in sorted(
            prewarm.LAST_JOB_WALLS.items(), key=lambda kv: -kv[1])
        if v > 1.0}
    print("RESULT " + json.dumps(result), flush=True)


def orchestrate() -> None:
    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(msg)
        with open(OUT, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    for mode in ("warmcache", "truecold"):
        env = dict(os.environ)
        if mode == "truecold":
            import tempfile

            env["STARK_TPU_COMPILE_CACHE"] = tempfile.mkdtemp(
                prefix="stark_cold_")
        for target in TARGETS:
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), target],
                capture_output=True, text=True, env=env, timeout=1800,
            )
            wall = time.perf_counter() - t0
            res = None
            for ln in r.stdout.splitlines():
                if ln.startswith("RESULT "):
                    res = json.loads(ln[7:])
            if res is None:
                log(f"[{mode}] {target}: FAILED rc={r.returncode} "
                    f"(wall {wall:.0f} s): {r.stderr[-500:]}")
                continue
            log(f"[{mode}] {target}: first {res['first_s']:.1f} s "
                f"(subprocess wall {wall:.1f} s)")
            for k in ("coset_evaluate_s", "prewarm_s", "fri_run_s"):
                if k in res:
                    log(f"    {k}: {res[k]:.1f} s")
            if res.get("prewarm_jobs"):
                log(f"    slowest compile jobs: {res['prewarm_jobs']}")
    log("PROBE-COLD DONE")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_target(sys.argv[1])
    else:
        orchestrate()
