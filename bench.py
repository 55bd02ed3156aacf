"""Benchmark harness — prints ONE JSON line (headline metric) to stdout.

Headline: 2^22-point NTT wall time on one chip (BASELINE.json metric #2).
``vs_baseline`` is the speedup over the best available host baseline (the
numpy Stockham NTT in stark_tpu.ntt.reference_ntt) measured on this same
machine — the reference Rust crate has no NTT at all (Readme.md:2 TODO),
so there is no reference number to compare against (BASELINE.md caveats).

All secondary metrics (field-mul ops/s/chip, Merkle leaves/s, FRI prove,
full STARK prove) go to stderr and benches/latest.json.

Usage: python bench.py [--quick] [--full-prove]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_time(fn, reps=5, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def robust_wall(fn, reps=9, warmup=1):
    """Drift-robust wall time: (min, median, spread) over `reps` runs.

    The tunneled TPU's per-run latency drifts by tens of ms over minutes
    (probe_warmregress_r4: a warm 2^14 prove sampled 15x spans 101-181 ms
    while its SYNCED phase split is stable).  Tunnel noise is strictly
    additive, so min-of-N estimates the intrinsic wall; the median and
    spread are recorded alongside so drift stays visible in artifacts
    (docs/PERF_MODEL.md "wall-clock estimator").  r3's 3-run median with
    no warmup is what flagged phantom regressions in BENCH_r03."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), statistics.median(ts), max(ts) - min(ts)


def _chain_run(step, x0, iters, k, reps):
    """Median wall of a jitted fori_loop of `iters` iterations whose body
    applies `step` k times, synced by a 4-byte fetch."""
    import jax
    import numpy as np

    def body(i, v):
        for _ in range(k):
            v = step(v)
        return v

    @jax.jit
    def chained(x):
        return jax.lax.fori_loop(0, iters, body, x)

    r = chained(x0)
    _ = np.asarray(r.reshape(-1)[:1])  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = chained(x0)
        _ = np.asarray(r.reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def chain_time(step, x0, iters=8, reps=3, samples=3):
    """Per-application cost of `step`, per-RUN overhead cancelled.

    The tunneled TPU pays a large fixed cost per dispatched run (~25 ms:
    dispatch + 4-byte fetch + sync), so total/iters over-reports sub-ms
    ops.  Difference two chain lengths at the same body instead:

        T(N) = F + N*(f + v)   =>   v + f = (T(2N) - T(N)) / N

    (f = fori_loop per-iteration overhead, ~us — included, which is why
    the NTT headline uses chain_marginal instead).  F drifts several ms
    over minutes on the tunnel, so each estimate pairs adjacent runs and
    the median of `samples` estimates is returned."""
    vs = []
    for _ in range(samples):
        t1 = _chain_run(step, x0, iters, 1, reps)
        t2 = _chain_run(step, x0, 2 * iters, 1, reps)
        vs.append(max((t2 - t1) / iters, 1e-9))
    vs.sort()
    return vs[len(vs) // 2]


def chain_marginal(step, x0, n_iters=24, reps=3, samples=5):
    """Marginal per-application cost of `step` — per-run AND per-loop-
    iteration overheads cancelled, with a stability report.

    Round 2's estimator compared T(total, k=1) vs T(total/4, k=4); with
    per-run cost F that algebra leaves v + F/total — a +1.7 ms bias at
    total=16 that tracked tunnel-latency drift (the r2 "instability":
    2.57 / 2.28 / 1.74 ms were different F's, same v; probe_slope2.py).
    Fix: hold the ITERATION count fixed and vary only the chain depth k:

        T(N, k) = F + N*f + N*k*v   =>   v = (T(N,4) - T(N,1)) / (3N)

    Returns (v_median, v_spread, T1/N) over `samples` estimates.  Only
    valid when chained applications cannot be algebraically fused or
    folded (an NTT chain qualifies; involutions like bitrev gathers, or
    fusible elementwise ops, do NOT — XLA simplifies them).

    F also DRIFTS several ms over minutes, which leaks into each
    estimate as dF/(3N) — n_iters=24 keeps a 25 ms drift under 0.35 ms,
    and the median over `samples` interleaved estimates rejects the
    drifty ones (the r3 driver-run guard; spread is recorded so drift is
    visible in BENCH artifacts)."""
    vs, percall = [], []
    for _ in range(samples):
        t1 = _chain_run(step, x0, n_iters, 1, reps)
        t4 = _chain_run(step, x0, n_iters, 4, reps)
        vs.append(max((t4 - t1) / (3 * n_iters), 1e-9))
        percall.append(t1 / n_iters)
    vs.sort()
    return (vs[len(vs) // 2], vs[-1] - vs[0],
            statistics.median(percall))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes (CI)")
    ap.add_argument("--full-prove", action="store_true",
                    help="also run the 2^18-row full STARK prove")
    ap.add_argument("--cpu", action="store_true", help="pin to CPU backend")
    ap.add_argument("--save-baseline", action="store_true",
                    help="store this run as the regression baseline")
    args = ap.parse_args()

    # If the TPU tunnel is configured but dead, backend init would hang
    # this process forever — probe it (bounded, in a subprocess) and fall
    # back to CPU with reduced sizes so the harness always emits numbers.
    # Artifact runs (non-quick) poll the canary up to ~10 minutes and
    # ignore any cached negative verdict: a single slow canary must not
    # turn the round's official record into a CPU run (BENCH_r04 did
    # exactly that — r4 Weak #2).
    from stark_tpu.utils.tunnel import ensure_live_backend

    if args.quick or args.cpu:
        platform_guard = ensure_live_backend()
    else:
        platform_guard = ensure_live_backend(
            timeout=120.0, retries=5, retry_sleep=30.0,
            honor_cached_negative=False)
    import jax

    if platform_guard == "cpu":
        log("CPU FALLBACK — no TPU numbers this run "
            "(tunnel unreachable after bounded canary retries)")
        args.quick = True
        args.full_prove = False
        # no persistent cache for fallback runs: loading serialized
        # XLA:CPU executables sprays AOT feature-mismatch warnings into
        # the driver artifact (r4 VERDICT missing #5)
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass

    if args.cpu:
        jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0] if not args.cpu else jax.local_devices(backend="cpu")[0]
    log(f"benchmarking on: {dev} (platform {dev.platform})")

    from stark_tpu.config import DEFAULT_MODULUS as P, ProverConfig
    from stark_tpu.fields import Fp

    results = {"device": str(dev), "platform": dev.platform,
               "tunnel_fallback": platform_guard == "cpu"}
    f = Fp.get(P)

    # -- 0. tunnel RTT measured IN-RUN (r4 Weak #4/#5: wall numbers mixed
    # intrinsic time with tunnel drift and nothing in the artifact could
    # separate them).  One tiny jit + 4-byte fetch, min-of-9: every
    # dispatch-bound wall below can be read against this floor.
    _rtt_step = jax.jit(lambda v: v + 1)
    _rtt_x = jax.device_put(jnp.ones(8, jnp.uint32), dev)
    np.asarray(_rtt_step(_rtt_x))[:1]
    _rtts = []
    for _ in range(9):
        t0 = time.perf_counter()
        _ = np.asarray(_rtt_step(_rtt_x))[:1]
        _rtts.append(time.perf_counter() - t0)
    results["tunnel_rtt_ms"] = min(_rtts) * 1e3
    results["tunnel_rtt_median_ms"] = statistics.median(_rtts) * 1e3
    log(f"tunnel RTT (tiny jit + 4-byte fetch): {min(_rtts)*1e3:.1f} ms min "
        f"(median {statistics.median(_rtts)*1e3:.1f})")

    def dev_rand(n, salt=1):
        """Pseudo-random field elements generated ON device (the tunneled
        TPU hangs on large host transfers; nothing big ever crosses)."""
        import functools

        @functools.partial(jax.jit, static_argnums=0)
        def gen(n, salt):
            i = jnp.arange(n, dtype=jnp.uint32)
            x = i * jnp.uint32(2654435761) + salt * jnp.uint32(40503)
            x = x ^ (x >> jnp.uint32(13))
            x = x * jnp.uint32(1274126177)
            return x % jnp.uint32(P)
        return jax.device_put(gen(n, jnp.uint32(salt)), dev)

    # -- 1. field mul ops/s/chip (data-dependent operands) -----------------
    n_mul = 1 << (22 if args.quick else 25)
    a = dev_rand(n_mul, 1)
    b = dev_rand(n_mul, 2)
    t = chain_time(lambda v: f.mul(v, b), a, iters=32)
    results["field_mul_ops_per_s"] = n_mul / t
    log(f"field mul: {n_mul / t / 1e9:.2f} Gops/s/chip ({t*1e3:.2f} ms @ 2^{n_mul.bit_length()-1})")

    # -- 2. NTT 2^22 (headline) -------------------------------------------
    from stark_tpu.ntt import get_plan
    from stark_tpu.ntt.reference_ntt import ntt_host

    log_n = 18 if args.quick else 22
    n = 1 << log_n
    x = dev_rand(n, 3)
    plan = get_plan(P, n, False)
    t0 = time.perf_counter()
    plan(x).block_until_ready()
    log(f"NTT 2^{log_n} compile+first run: {time.perf_counter()-t0:.1f} s")
    t_ntt, t_spread, t_percall = chain_marginal(lambda v: plan(v), x)
    results[f"ntt_2e{log_n}_ms"] = t_ntt * 1e3
    results[f"ntt_2e{log_n}_spread_ms"] = t_spread * 1e3
    results[f"ntt_2e{log_n}_per_call_ms"] = t_percall * 1e3
    log(f"NTT 2^{log_n}: {t_ntt*1e3:.3f} ms marginal (spread "
        f"{t_spread*1e3:.3f}; {t_percall*1e3:.2f} ms per dispatched call "
        f"incl. per-run overhead; {n * log_n / t_ntt / 1e9:.2f} G "
        "butterfly/s)")

    # host numpy baseline on a smaller size, scaled n log n.  The input is
    # regenerated host-side with the same formula — NO device fetch (the
    # tunnel wedges on multi-MB device->host transfers mid-session).
    base_log = min(log_n, 18)
    i = np.arange(1 << base_log, dtype=np.uint32)
    with np.errstate(over="ignore"):
        xh = i * np.uint32(2654435761) + np.uint32(3) * np.uint32(40503)
        xh = xh ^ (xh >> np.uint32(13))
        xh = xh * np.uint32(1274126177)
    xb = (xh % np.uint32(P)).astype(np.uint32)
    t_host = median_time(lambda: ntt_host(xb, P), reps=3, warmup=1)
    t_host_scaled = t_host * (n * log_n) / ((1 << base_log) * base_log)
    results["ntt_host_baseline_ms"] = t_host_scaled * 1e3
    vs_baseline = t_host_scaled / t_ntt
    log(f"host numpy NTT (scaled to 2^{log_n}): {t_host_scaled*1e3:.1f} ms "
        f"-> speedup {vs_baseline:.1f}x")

    # -- 3. Merkle 2^22 leaves (BASELINE config #4) ------------------------
    from stark_tpu.merkle.tree import _build_jit, _use_pallas_build

    log_m = 16 if args.quick else 22
    m = 1 << log_m
    leaves = dev_rand(m, 4)
    if _use_pallas_build(m, leaves):
        from stark_tpu.hash.pallas_sha import build_tree_bitrev

        build = build_tree_bitrev
        log("merkle: using Pallas bitrev SHA kernels")
    else:
        build = _build_jit(m)
    t0 = time.perf_counter()
    jax.block_until_ready(build(leaves))
    log(f"Merkle 2^{log_m} compile+first: {time.perf_counter()-t0:.1f} s")
    def mk_step(v):
        levels = build(v)
        return v ^ levels[-1][0, 0]  # force dependency on the whole tree

    t_mk = chain_time(mk_step, leaves, iters=8)
    results[f"merkle_2e{log_m}_ms"] = t_mk * 1e3
    results["merkle_leaves_per_s"] = m / t_mk
    log(f"Merkle tree 2^{log_m} leaves: {t_mk*1e3:.1f} ms ({m/t_mk/1e6:.2f} M leaves/s)")

    # -- 4. FRI commit 2^18 codeword, blowup 8 (BASELINE config #3) --------
    from stark_tpu.channel import Channel
    from stark_tpu.fri import fri_commit, decommit_fri
    from stark_tpu.ntt import coset_evaluate

    log_deg = 12 if args.quick else 18
    blowup = 8
    t0 = time.perf_counter()
    from stark_tpu.utils.prewarm import prewarm_fri

    # prewarm FIRST, covering the whole path (LDE NTT + ladder + channel
    # jits in one parallel pool) — r3 paid coset_evaluate's compile
    # serially before the ladder prewarm started
    prewarm_fri(P, blowup << log_deg, log_deg, 5, lde_deg=log_deg)
    coeffs = dev_rand(1 << log_deg, 5)
    cw = coset_evaluate(coeffs, P, blowup << log_deg, 5)
    cw.block_until_ready()

    def fri_run():
        ch = Channel(P)
        pr = fri_commit(cw, P, 5, ch, num_folds=log_deg)
        decommit_fri(16, (blowup << log_deg) - 1, pr.fri_layers, pr.fri_merkles, ch)
        return ch

    fri_run()
    t_fri_first = time.perf_counter() - t0
    results[f"fri_2e{log_deg}_first_s"] = t_fri_first
    log(f"FRI 2^{log_deg} first (compiles): {t_fri_first:.1f} s")
    t_fri, t_fri_med, t_fri_spread = robust_wall(fri_run, reps=7, warmup=1)
    results[f"fri_prove_2e{log_deg}_ms"] = t_fri * 1e3
    results[f"fri_prove_2e{log_deg}_median_ms"] = t_fri_med * 1e3
    results[f"fri_prove_2e{log_deg}_spread_ms"] = t_fri_spread * 1e3
    log(f"FRI commit+decommit deg 2^{log_deg} blowup {blowup}: "
        f"{t_fri*1e3:.1f} ms min (median {t_fri_med*1e3:.1f}, "
        f"spread {t_fri_spread*1e3:.1f})")

    # synced per-stage split (r4 Weak #4: the FRI wall swung 181->263 ms
    # across same-code runs with no split to localize the drift; the
    # prove has one, the FRI bench now does too).  A 4-byte fetch forces
    # each stage boundary — block_until_ready does not truly await
    # completion through the tunnel (probe_ntt3_r5 finding).
    def fri_split():
        ch = Channel(P)
        t0 = time.perf_counter()
        pr = fri_commit(cw, P, 5, ch, num_folds=log_deg)
        np.asarray(pr.fri_layers[-1].reshape(-1)[:1])
        t_commit = time.perf_counter() - t0
        t0 = time.perf_counter()
        decommit_fri(16, (blowup << log_deg) - 1, pr.fri_layers,
                     pr.fri_merkles, ch)
        t_decommit = time.perf_counter() - t0
        return t_commit, t_decommit

    fri_split()  # warm the synced variant
    splits = [fri_split() for _ in range(3)]
    c_min = min(s[0] for s in splits)
    d_min = min(s[1] for s in splits)
    results[f"fri_2e{log_deg}_commit_ms"] = c_min * 1e3
    results[f"fri_2e{log_deg}_decommit_ms"] = d_min * 1e3
    log(f"  FRI split (synced, min of 3): commit {c_min*1e3:.1f} ms, "
        f"decommit {d_min*1e3:.1f} ms; tunnel RTT "
        f"{results['tunnel_rtt_ms']:.1f} ms/sync")

    # -- 5. full STARK prove (always: warm wall time at 2^14) --------------
    from stark_tpu.stark import prove, verify

    log2_tr = 10 if args.quick else 14
    cfg = ProverConfig(log2_trace=log2_tr, blowup=4, num_queries=16)
    t0 = time.perf_counter()
    proof = prove(cfg)
    t_first = time.perf_counter() - t0
    results[f"stark_prove_2e{log2_tr}_first_s"] = t_first
    log(f"STARK prove 2^{log2_tr} first (compiles): {t_first:.1f} s")
    from stark_tpu.utils import progcache

    if progcache.LAST_EVENTS:
        log(f"  program cache: {progcache.LAST_EVENTS}")
    # cache attribution lives IN the artifact, not just stderr: a
    # first-run wall that can't be tied to a cache state isn't evidence
    # (r4 Weak #7 — the 66.5 s vs 202 s swing between the two r4 TPU
    # runs was invisible cache state)
    results[f"stark_prove_2e{log2_tr}_first_cache"] = dict(
        progcache.LAST_EVENTS)
    cache_dir = jax.config.jax_compilation_cache_dir
    if cache_dir and os.path.isdir(cache_dir):
        results["xla_cache_entries"] = sum(
            len(fs) for _, _, fs in os.walk(cache_dir))
    t_pv, t_pv_med, t_pv_spread = robust_wall(lambda: prove(cfg), reps=9)
    results[f"stark_prove_2e{log2_tr}_warm_ms"] = t_pv * 1e3
    results[f"stark_prove_2e{log2_tr}_warm_median_ms"] = t_pv_med * 1e3
    results[f"stark_prove_2e{log2_tr}_warm_spread_ms"] = t_pv_spread * 1e3
    assert verify(proof)
    log(f"STARK prove 2^{log2_tr} rows (warm): {t_pv*1e3:.0f} ms min "
        f"(median {t_pv_med*1e3:.0f}, spread {t_pv_spread*1e3:.0f}; verified)")
    sz, csz = proof.size_bytes(), proof.compressed_size_bytes()
    results[f"proof_bytes_2e{log2_tr}"] = sz
    results[f"proof_bytes_2e{log2_tr}_compressed"] = csz
    log(f"proof size: {sz} bytes transcript, {csz} compressed ({100*csz/sz:.0f}%)")

    # per-phase split (SURVEY §5.5): one instrumented prove with precise
    # phase syncs; the split localizes where warm-prove time goes
    from stark_tpu.utils.metrics import MetricsCollector

    prove(cfg, metrics=MetricsCollector())  # warm the per-phase path:
    # precise-metrics proves skip the mega program, so their first run
    # pays the per-phase executables' first loads (~0.5-1 s each via the
    # tunnel) — the split localizes runtime, not load time
    mx = MetricsCollector()
    prove(cfg, metrics=mx)
    results["prove_phase_split"] = mx.to_dict()
    phase_sum = 0.0
    for ph in mx.to_dict()["phases"]:
        phase_sum += ph["wall_s"]
        log(f"  phase {ph['name']}: {ph['wall_s']*1e3:.1f} ms")
    # async-dispatch saving (SURVEY §2.9 pipeline-parallel row): the
    # un-synced prove overlaps device work across phase boundaries AND
    # skips the per-phase tunnel sync, so (synced phase sum - warm wall)
    # is an UPPER BOUND mixing true pipelining with avoided sync
    # latency (~10 ms per forced sync) — recorded as such, not as a
    # pure overlap measurement (r2 verdict weak #7)
    overlap = phase_sum - t_pv
    results["prove_async_saving_upper_bound_ms"] = overlap * 1e3
    log(f"  async-dispatch saving (overlap + avoided per-phase syncs, "
        f"upper bound): {overlap*1e3:.1f} ms "
        f"({100*overlap/max(phase_sum,1e-9):.0f}% of synced phase sum)")

    # -- 6. other statement families (warm wall at a small size) ----------
    from stark_tpu.stark import FibMulAIR, MimcAIR

    fam_cfg = ProverConfig(log2_trace=10 if args.quick else 12, blowup=4,
                           num_queries=16)
    for fam_name, mk in (("mimc3", lambda: MimcAIR(x0=271828)),
                         ("fibmul", lambda: FibMulAIR(b0=2718281))):
        t0 = time.perf_counter()
        pf = prove(fam_cfg, air=mk())
        log(f"{fam_name} prove 2^{fam_cfg.log2_trace} first: "
            f"{time.perf_counter()-t0:.1f} s")
        t_f, t_f_med, t_f_spread = robust_wall(
            lambda: prove(fam_cfg, air=mk()), reps=9)
        results[f"{fam_name}_prove_2e{fam_cfg.log2_trace}_warm_ms"] = t_f * 1e3
        results[f"{fam_name}_prove_2e{fam_cfg.log2_trace}_warm_median_ms"] = (
            t_f_med * 1e3)
        assert verify(pf)
        log(f"{fam_name} prove 2^{fam_cfg.log2_trace} (warm): "
            f"{t_f*1e3:.0f} ms min (median {t_f_med*1e3:.0f}, "
            f"spread {t_f_spread*1e3:.0f}; verified)")

    # -- 7. Goldilocks field warm prove ------------------------------------
    g_cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                         log2_trace=8 if args.quick else 10, blowup=4,
                         num_queries=16)
    t0 = time.perf_counter()
    pg = prove(g_cfg)
    results[f"goldilocks_prove_2e{g_cfg.log2_trace}_first_s"] = (
        time.perf_counter() - t0)
    log(f"goldilocks prove 2^{g_cfg.log2_trace} first: "
        f"{results[f'goldilocks_prove_2e{g_cfg.log2_trace}_first_s']:.1f} s")
    t_g, t_g_med, t_g_spread = robust_wall(lambda: prove(g_cfg), reps=9)
    results[f"goldilocks_prove_2e{g_cfg.log2_trace}_warm_ms"] = t_g * 1e3
    results[f"goldilocks_prove_2e{g_cfg.log2_trace}_warm_median_ms"] = (
        t_g_med * 1e3)
    assert verify(pg)
    log(f"goldilocks prove 2^{g_cfg.log2_trace} (warm): {t_g*1e3:.0f} ms min "
        f"(median {t_g_med*1e3:.0f}, spread {t_g_spread*1e3:.0f}; verified)")

    # -- 8. big-trace prove (BASELINE north star: FRI prove at 2^20+) ------
    # always recorded (not gated behind --full-prove) so every BENCH_rN
    # artifact carries a big-trace number; benches/probe_bigtrace_r3.txt
    # has the full 2^18..2^24 ladder.
    if not args.quick:
        big_cfg = ProverConfig(log2_trace=18, blowup=4, num_queries=16)
        t0 = time.perf_counter()
        proof = prove(big_cfg)
        log(f"STARK prove 2^18 first (compiles): {time.perf_counter()-t0:.1f} s")
        t_pv, t_pv_med, t_pv_spread = robust_wall(
            lambda: prove(big_cfg), reps=5, warmup=0)
        results["stark_prove_2e18_warm_ms"] = t_pv * 1e3
        results["stark_prove_2e18_warm_median_ms"] = t_pv_med * 1e3
        assert verify(proof)
        log(f"STARK prove 2^18 rows (warm): {t_pv*1e3:.0f} ms min "
            f"(median {t_pv_med*1e3:.0f}, spread {t_pv_spread*1e3:.0f}; "
            "verified)")
    if args.full_prove:
        cfg = ProverConfig(log2_trace=20, blowup=4, num_queries=16)
        t0 = time.perf_counter()
        proof = prove(cfg)
        log(f"STARK prove 2^20 first (compiles): {time.perf_counter()-t0:.1f} s")
        t_pv, t_pv_med, _ = robust_wall(lambda: prove(cfg), reps=3, warmup=0)
        results["stark_prove_2e20_warm_ms"] = t_pv * 1e3
        assert verify(proof)
        log(f"STARK prove 2^20 rows (warm): {t_pv*1e3:.0f} ms min "
            f"(median {t_pv_med*1e3:.0f}; verified)")

    # -- big-trace ladder (BASELINE north star) ---------------------------
    # measured on hardware by benches/probe_bigtrace_r5.py (min-of-3 warm
    # walls — the r4 ladder's mean-of-2 at 2^24 violated the repo's own
    # estimator policy); parsed into the artifact so every BENCH_rN
    # carries the ladder without re-paying its compile budget.  Falls
    # back to the r4 artifact for any size the r5 probe lacks.
    if not args.quick:
        import re as _re

        ladder = {}
        for big_path, rex in (
            ("benches/probe_bigtrace_r4.txt",
             r"2\^(\d+) rows warm: (\d+) ms .*verified=True"),
            ("benches/probe_bigtrace_r5.txt",
             r"2\^(\d+) rows warm: (\d+) ms min .*verified=True"),
        ):
            if not os.path.exists(big_path):
                continue
            with open(big_path) as fh:
                for line in fh:
                    m = _re.search(rex, line)
                    if m:  # later (r5) entries overwrite r4 ones
                        ladder[f"2^{m.group(1)}"] = int(m.group(2))
        if ladder:
            results["bigtrace_ladder_warm_ms"] = ladder
            log(f"  big-trace ladder (probe artifacts): {ladder}")

    # -- virtual-mesh scaling table (model vs measured side by side) ------
    # measured by benches/probe_scaling.py on the 8-virtual-device CPU
    # mesh (collective-path trend/regression coverage; byte-identity
    # tests cannot see a slow lowering) — carried into every BENCH
    # artifact when the probe artifact exists
    scaling_path = "benches/scaling.json"
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            sc = json.load(fh)
        results["scaling_virtual_mesh"] = {
            "note": sc.get("note"),
            "measured": sc.get("measured"),
            "model_efficiency": [
                {"devices": r["devices"],
                 "efficiency": round(r["efficiency"], 3)}
                for r in sc.get("model", {}).get("rows", [])],
        }
        for row in sc.get("measured", []):
            log(f"  scaling (virtual mesh) devices={row['devices']}: "
                f"{row['warm_min_ms']:.0f} ms min, collectives "
                f"{row.get('collectives_ntt')}")

    # -- 9. serving path: cold CLIENT against a resident daemon -----------
    # The framework's answer to per-process program acquisition
    # (stark_tpu/serve.py): a daemon owns the compiled programs, clients
    # are thin.  Spawn one (inherits this run's warm disk caches), prove
    # from a FRESH subprocess, record the end-to-end client wall — the
    # "first prove" a CLI user actually experiences with serving on.
    if not args.quick:
        import subprocess as _sp
        import tempfile

        from stark_tpu import serve

        sock = os.path.join(tempfile.gettempdir(),
                            f"stark_bench_{os.getpid()}.sock")
        try:
            t0 = time.perf_counter()
            serve.ensure_daemon(sock, wait_s=900,
                                extra_args=("--warm", str(log2_tr)))
            t_up = time.perf_counter() - t0
            results["daemon_startup_warm_s"] = t_up
            client_src = (
                "import sys, time\n"
                "sys.path.insert(0, '.')\n"
                "from stark_tpu import serve\n"
                "from stark_tpu.config import ProverConfig\n"
                f"cfg = ProverConfig(log2_trace={log2_tr}, blowup=4, "
                "num_queries=16)\n"
                "t0 = time.perf_counter()\n"
                f"p = serve.daemon_prove(cfg, socket_path={sock!r})\n"
                "print('CLIENT_MS', (time.perf_counter() - t0) * 1e3)\n")
            walls = []
            for _ in range(3):
                cl = _sp.run([sys.executable, "-c", client_src],
                             capture_output=True, text=True, timeout=600)
                for ln in (cl.stdout or "").splitlines():
                    if ln.startswith("CLIENT_MS"):
                        walls.append(float(ln.split()[1]))
            if walls:
                results[f"daemon_client_prove_2e{log2_tr}_ms"] = min(walls)
                log(f"daemon: startup+warm {t_up:.1f} s (one-time); cold "
                    f"CLIENT prove 2^{log2_tr}: {min(walls):.0f} ms min of "
                    f"{[round(w) for w in sorted(walls)]} — vs "
                    f"{t_first:.0f} s per-process first prove")
        except Exception as e:
            log(f"daemon bench skipped: {type(e).__name__}: {e}")
        finally:
            try:
                serve.request({"op": "shutdown"}, sock, timeout=30)
            except Exception:
                pass

    # final snapshot of every cached-program event this run (hit/miss/off
    # per program name) — cold walls for the later sections (FRI first,
    # Goldilocks first, daemon) read against this
    from stark_tpu.utils import progcache as _pc

    if _pc.LAST_EVENTS:
        results["progcache_events"] = dict(_pc.LAST_EVENTS)

    os.makedirs("benches", exist_ok=True)
    # quick/CPU runs must never clobber the TPU record (latest.json feeds
    # the README generator and the regression baseline)
    latest_path = ("benches/latest_quick.json"
                   if args.quick or args.cpu or platform_guard == "cpu"
                   else "benches/latest.json")
    with open(latest_path, "w") as fh:
        json.dump(results, fh, indent=2)

    # -- regression gate (SURVEY §4: benchmarks double as regression
    # tests; the reference ran Criterion's baseline comparison) ---------
    from stark_tpu.utils.regression import compare, save_baseline

    base_path = "benches/baseline.json"
    regressed = False
    # a CPU-fallback run must never be compared against a TPU baseline:
    # BENCH_r04's tail was full of cross-platform [-97.9%] noise verdicts
    # (r4 Weak #1).  Platform mismatch => skip the gate entirely.
    base_platform = None
    if os.path.exists(base_path):
        try:
            with open(base_path) as fh:
                base_platform = json.load(fh).get("platform")
        except (OSError, ValueError):
            base_platform = None
    if base_platform is not None and base_platform != results["platform"]:
        log(f"regression gate SKIPPED: this run is platform "
            f"'{results['platform']}' but the baseline is "
            f"'{base_platform}' — cross-platform comparison is "
            "meaningless")
    else:
        # spread/median keys are drift diagnostics, not metrics; the host
        # numpy NTT baseline swings with CPU contention; first-run (cold)
        # walls swing with compile-service load and cache state — none of
        # them should trip the gate (cold-start targets are tracked
        # against VERDICT thresholds in the probe artifacts instead)
        gated = {k: v for k, v in results.items()
                 if not any(s in k for s in ("spread", "median",
                                             "host_baseline", "_first_s",
                                             "cache_entries"))}
        for v in compare(gated, base_path, threshold=0.15):
            tag = v["verdict"].upper()
            if tag == "REGRESSED":
                regressed = True
            if tag != "UNCHANGED":
                log(f"  [{tag}] {v['metric']}: {v['current']:.4g} vs "
                    f"baseline {v['baseline']:.4g} "
                    f"({v['change_pct']:+.1f}%)")
        if regressed:
            log("REGRESSED metrics above — investigate before accepting "
                "(baseline: benches/baseline.json; refresh with "
                "--save-baseline)")
    if args.save_baseline or not os.path.exists(base_path):
        save_baseline(results, base_path)
        log(f"baseline saved to {base_path}")

    # any run that rewrites benches/latest.json regenerates the README in
    # the same step, so artifact and README can never disagree at HEAD
    # (r4 Weak #3; enforced by tests/test_readme_numbers.py)
    if latest_path == "benches/latest.json":
        import subprocess

        rr = subprocess.run(
            [sys.executable, "benches/render_readme.py"],
            capture_output=True, text=True)
        log(f"README regen: rc={rr.returncode} "
            f"{(rr.stdout or rr.stderr).strip()}")

    print(json.dumps({
        "metric": f"ntt_2e{log_n}_ms",
        "value": round(t_ntt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 2),
        "platform": results["platform"],
        "tunnel_fallback": results["tunnel_fallback"],
    }))


if __name__ == "__main__":
    main()
