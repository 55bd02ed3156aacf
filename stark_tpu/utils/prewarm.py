"""Parallel compile pre-warming — the cold-prove cliff killer.

A cold prove compiles ~15-20 XLA programs (NTT plans, tree builds, the
fused FRI layer per size, composition, the query-phase program), each
taking 2-20 s on the tunneled TPU's compile service.  Round 2 paid them
serially (84 s first prove at 2^14, 171 s first FRI at 2^18).  The
compile service parallelizes almost perfectly across client threads
(benches/probe_compile_r3.txt: four ~20 s layer compiles finish in
24 s wall), so this module derives every program a prove will need from
the STATIC config, feeds each one dummy zero-valued device inputs of the
right shapes from a thread pool, and returns when all are compiled —
cold wall collapses to roughly the heaviest single program.

Dummy executions are harmless: every jitted program here is pure field /
hash arithmetic with no host assertions inside.  The jit caches are
keyed by shape, so the later real calls hit the compiled executables
directly.  Prewarm is per-(config, air) cached, opt-out with
STARK_TPU_NO_PREWARM=1, and a no-op off-TPU (CPU compiles are cheap and
tests would pay double).
"""

from __future__ import annotations

import functools
import os
import threading

_done: set = set()
_lock = threading.Lock()


def _enabled() -> bool:
    import jax

    if os.environ.get("STARK_TPU_NO_PREWARM"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# per-job compile walls of the last prewarm run, for cold-start probes
# ({name: seconds}; parallel walls — the slowest job bounds the phase)
LAST_JOB_WALLS: dict = {}


def _run_jobs(jobs) -> None:
    """Execute compile jobs from a thread pool; failures only warn (the
    prove would compile on demand anyway)."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from stark_tpu.utils.logging import get_logger

    log = get_logger()

    def safe(job):
        name, fn = job
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:  # pragma: no cover - diagnostics only
            log.warning("prewarm job %s failed: %s", name, e)
        LAST_JOB_WALLS[name] = time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(safe, jobs))


def _zeros(shape):
    import jax.numpy as jnp

    return jnp.zeros(shape, jnp.uint32)


def _eshape(n: int, width: int, ncols: int = 1):
    """Device shape of an n-element value array: (n,) u32, (2, n) limb
    planes, (C, n) columns, or (C, 2, n) wide columns."""
    if ncols > 1:
        return (ncols, 2, n) if width == 2 else (ncols, n)
    return (2, n) if width == 2 else (n,)


def _ladder_jobs(p: int, n: int, num_folds: int, offset: int, width: int,
                 pallas_ok: bool, pruned: bool = False):
    """Compile jobs for every fused FRI layer program of a size-n ladder
    (fri/commit._layer_jit), plus the shared Pallas tree kernels.
    `pruned` mirrors the deferred/single-fetch path's pruned digest
    storage (merkle.tree.prune_depth_for)."""
    from stark_tpu.fri.commit import _inv_domain, _layer_jit
    from stark_tpu.merkle.tree import _use_pallas_build, prune_depth_for

    jobs = []
    size, off = n, int(offset) % p
    for _ in range(num_folds):
        m, o = size, off

        def job(m=m, o=o):
            pallas = pallas_ok and _use_pallas_build(m // 2)
            prune = prune_depth_for(m // 2) if pruned else 0
            _layer_jit(p, m, pallas, prune=prune)(
                _zeros((8,)), _zeros(_eshape(m, width)),
                _inv_domain(p, m, o))

        jobs.append((f"fri-layer-2^{m.bit_length() - 1}", job))
        size //= 2
        off = off * off % p
    return jobs


def _tree_jobs(n: int, width: int, ncols: int, pallas_ok: bool):
    """Compile jobs for the trace commitment tree at n leaves."""
    from stark_tpu.merkle.tree import (_build_columns_jit, _build_jit,
                                       _use_pallas_build)

    if ncols > 1:
        return [("trace-tree-cols",
                 lambda: _build_columns_jit(ncols, n)(_zeros((ncols, n))))]
    if pallas_ok and _use_pallas_build(n):
        from stark_tpu.hash.pallas_sha import build_tree_bitrev

        return [("trace-tree-pallas",
                 lambda: build_tree_bitrev(_zeros(_eshape(n, width))))]
    return [("trace-tree-xla",
             lambda: _build_jit(n, width == 2)(_zeros(_eshape(n, width))))]


def prewarm_fri(p: int, n: int, num_folds: int, offset: int,
                pallas_ok: bool = True, lde_deg: int | None = None) -> None:
    """Pre-compile a bare FRI ladder (bench.py's fri_commit path).

    With `lde_deg`, also compiles the codeword-producing LDE programs
    (coset_evaluate's scale-pad + size-n NTT from a 2^lde_deg coefficient
    vector) and the device-channel jits — the full standalone-FRI bench
    path, so the bench's "first (compiles)" number is the PARALLEL
    compile wall (r3 paid the LDE and channel compiles serially before
    prewarm even started)."""
    if not _enabled():
        return
    key = ("fri", p, n, num_folds, int(offset) % p, pallas_ok, lde_deg)
    with _lock:
        if key in _done:
            return
        _done.add(key)
    from stark_tpu.fields.fp import Fp

    width = Fp.get(p).width
    jobs = _ladder_jobs(p, n, num_folds, offset, width, pallas_ok)
    if lde_deg is not None:
        from stark_tpu.ntt.ntt import _scale_pad_jit, get_plan

        d = 1 << lde_deg
        # plans build host twiddles — instantiate before the pool
        plan_f = get_plan(p, n, False)
        scale = _scale_pad_jit(p, d, n, int(offset) % p)
        jobs += [
            ("lde-scale-pad", lambda: scale(_zeros(_eshape(d, width)))),
            ("lde-ntt", lambda: plan_f(_zeros(_eshape(n, width)))),
        ]

        def channel_jobs():
            import jax.numpy as jnp

            from stark_tpu.channel.device_channel import (
                jit_absorb, jit_absorb_initial, jit_absorb_value, jit_draw)

            dd = _zeros((8,))
            jit_absorb_initial()(dd)
            jit_absorb()(dd, dd)
            jit_draw(p)(dd)
            jit_absorb_value()(dd, jnp.zeros((), jnp.uint32),
                               jnp.zeros((), jnp.uint32))

        jobs.append(("device-channel", channel_jobs))
    # the INITIAL (unfolded) layer's tree — fri_commit builds it before
    # any fold; at n >= 2^17 on TPU that is the standalone Pallas build,
    # whose level kernels the ladder jobs never touch (probe_cold_r4:
    # fri_run_s stayed ~117 s after a complete prewarm)
    def initial_tree_job():
        from stark_tpu.merkle.tree import MerkleTree

        MerkleTree(_zeros(_eshape(n, width)))

    jobs.append(("fri-initial-tree", initial_tree_job))
    _run_jobs(jobs)

    # stage 2 (needs the built shapes): the decommit_fri query program
    def query_job():
        from stark_tpu.channel import device_query as _dq
        from stark_tpu.fri.commit import _inv_domain, _layer_jit
        from stark_tpu.merkle.tree import (MerkleTree, _use_pallas_build,
                                           bitrev_layouts)

        lengths = tuple(n >> k for k in range(num_folds + 1))
        rng = n  # decommit_fri draws over [0, max_index], max_index = n-1
        if not _dq.supported(rng, None, lengths, elem_width=width):
            return
        layers = [_zeros(_eshape(n, width))]
        trees = [MerkleTree(layers[0])]
        size, off = n, int(offset) % p
        for _ in range(num_folds):
            use_pallas = pallas_ok and _use_pallas_build(size // 2)
            out = _layer_jit(p, size, use_pallas)(
                _zeros((8,)), _zeros(_eshape(size, width)),
                _inv_domain(p, size, off))
            folded, levels = out[0], out[1:-2]
            trees.append(MerkleTree(
                None, device_levels=tuple(levels),
                layouts=bitrev_layouts(size // 2) if use_pallas else None))
            layers.append(folded)
            size //= 2
            off = off * off % p
        _dq.get_plan(
            rng, 16, (), None, lengths, elem_width=width,
            fri_prev=tuple(t.prev_depth for t in trees),
        ).run_device(_zeros((8,)), None, (), layers,
                     [t.levels[:-1] for t in trees])

    if lde_deg is not None:
        _run_jobs([("fri-query-phase", query_job)])


def prewarm_prove(cfg, air=None) -> None:
    """Pre-compile every device program prove(cfg, air) dispatches, in
    parallel.  Called from stark.prover.prove on TPU backends."""
    if not _enabled():
        return
    if air is None:
        from stark_tpu.stark.air import FibonacciSquareAIR

        air = FibonacciSquareAIR()
    key = ("prove", cfg, air.name, getattr(air, "k", None))
    with _lock:
        if key in _done:
            return
        _done.add(key)

    import jax.numpy as jnp

    from stark_tpu.fields.fp import Fp
    from stark_tpu.ntt.ntt import _scale_pad_jit, get_plan

    p = cfg.modulus
    N = cfg.trace_domain_size
    M = cfg.eval_domain_size
    h = cfg.offset
    f = Fp.get(p)
    width = f.width
    ncols = getattr(air, "num_columns", 1)
    num_folds = air.num_folds(cfg)

    # plan objects build host twiddle tables — instantiate serially (the
    # lru caches would otherwise race and double-compile)
    plan_i = get_plan(p, N, True)
    plan_f = get_plan(p, M, False)
    scale = _scale_pad_jit(p, N, M, int(h) % p)

    jobs = [
        ("intt", lambda: plan_i(_zeros(_eshape(N, width, ncols)))),
        ("scale-pad", lambda: scale(_zeros(_eshape(N, width, ncols)))),
        ("ntt-lde", lambda: plan_f(_zeros(_eshape(M, width, ncols)))),
    ]
    # the FRI ladder folds the composition polynomial — always a single
    # codeword, whatever the trace column count
    jobs += _tree_jobs(M, width, ncols, pallas_ok=True)
    jobs += _ladder_jobs(p, M, num_folds, h, width, pallas_ok=True,
                         pruned=True)

    def compose_job():
        from stark_tpu.stark.prover import get_air_context

        ctx = get_air_context(air, cfg)
        trace = air.build_trace(cfg)
        publics = air.publics(trace)  # tiny dummy fetch, keys matter only
        alphas = tuple(f.const(i + 1) for i in range(air.num_alphas))
        ctx.compose(_zeros(_eshape(M, width, ncols)), alphas, publics)

    jobs.append(("composition", compose_job))

    def channel_jobs():
        from stark_tpu.channel.device_channel import (
            jit_absorb, jit_absorb_initial, jit_absorb_value, jit_draw)

        d = _zeros((8,))
        jit_absorb_initial()(d)
        jit_absorb()(d, d)
        jit_draw(p)(d)
        jit_absorb_value()(d, jnp.zeros((), jnp.uint32),
                           jnp.zeros((), jnp.uint32))

    # the single-dispatch ("mega") program — what a default prove
    # actually launches in the latency-bound regime (stark/prover
    # _use_mega); the per-phase jobs above stay for the metrics/sharded/
    # checkpoint paths and the bench's phase split
    def mega_job():
        import jax

        from stark_tpu.stark import prover as _prover

        if not _prover._use_mega(M, None, False, width=width):
            return
        ctx = _prover.get_air_context(air, cfg)
        f_evals = _zeros(_eshape(M, width, ncols))
        offsets = tuple(s * cfg.blowup for s in air.shifts)
        rng = M - max(offsets)
        fri_lengths = tuple(M >> k for k in range(num_folds + 1))
        from stark_tpu.channel import device_query as _dq

        if not _dq.supported(rng, M, fri_lengths, ncols, width):
            return
        setup = _prover._mega_setup(cfg, air, ctx, f_evals, offsets, rng,
                                    fri_lengths, ncols, width)
        fn = _prover._get_mega_fn(cfg, air, ctx, setup, ncols, width, True)
        trace = air.build_trace(cfg)
        publics = air.publics(trace)
        comp_extras = ctx.compose_args(publics)
        jax.block_until_ready(fn(
            jnp.zeros((8,), jnp.uint32), f_evals, comp_extras,
            setup["inv_doms"]))

    jobs.append(("mega-prove", mega_job))
    jobs.append(("device-channel", channel_jobs))
    _run_jobs(jobs)

    # Stage 2: the query-phase program needs the tree level shapes the
    # stage-1 builds produce; compile it against freshly built dummies.
    def query_job():
        from stark_tpu.channel import device_query as _dq
        from stark_tpu.fri.commit import _inv_domain, _layer_jit
        from stark_tpu.merkle.tree import (MerkleTree, _use_pallas_build,
                                           bitrev_layouts, prune_depth_for)

        offsets = tuple(s * cfg.blowup for s in air.shifts)
        rng = M - max(offsets)
        fri_lengths = tuple(M >> k for k in range(num_folds + 1))
        if not _dq.supported(rng, M, fri_lengths, ncols, width):
            return
        f_evals = _zeros(_eshape(M, width, ncols))
        t_prune = prune_depth_for(M)
        trace_tree = (MerkleTree.from_columns(f_evals, prune=t_prune)
                      if ncols > 1 else MerkleTree(f_evals, prune=t_prune))
        layers, trees = [f_evals if ncols == 1 else f_evals[0]], []
        size, off = M, int(h) % p
        for _ in range(num_folds):
            pallas = _use_pallas_build(size // 2)
            prune = prune_depth_for(size // 2)
            out = _layer_jit(p, size, pallas, prune=prune)(
                _zeros((8,)), _zeros(_eshape(size, width)),
                _inv_domain(p, size, off))
            folded, levels = out[0], out[1:-2]
            trees.append(MerkleTree(
                None, device_levels=tuple(levels),
                layouts=(bitrev_layouts(size // 2)[prune:] if pallas
                         else None),
                prune=prune))
            layers.append(folded)
            size //= 2
            off = off * off % p
        # the unfolded layer's tree is the composition commitment
        cw_tree = (MerkleTree(layers[0], prune=prune_depth_for(M))
                   if ncols == 1
                   else MerkleTree(f_evals[0], prune=prune_depth_for(M)))
        all_trees = [cw_tree] + trees
        plan = _dq.get_plan(
            rng, cfg.num_queries, offsets, M, fri_lengths,
            elem_width=width, num_columns=ncols,
            trace_prev=trace_tree.prev_depth,
            fri_prev=tuple(t.prev_depth for t in all_trees),
            trace_prune=trace_tree.prune,
            fri_prune=tuple(t.prune for t in all_trees))
        plan.run_device(_zeros((8,)), f_evals, trace_tree.levels[:-1],
                        layers, [t.levels[:-1] for t in all_trees])

    _run_jobs([("query-phase", query_job)])
