"""Top-level STARK prover — fills the reference's empty ``src/prover/``
stub (0 bytes, SURVEY §2).  Orchestrates the full pipeline, generic over
the AIR (stark_tpu.stark.air):

    trace -> trace polynomial (INTT) -> LDE on coset (NTT) ->
    Merkle-commit trace -> draw alphas -> composition polynomial ->
    FRI commit/fold (per-layer Merkle + beta) -> per-query decommitment

Host<->device traffic is the protocol minimum (SURVEY §3.3): one 32-byte
root per commitment up, one challenge scalar down, and ONE batched fetch
per query at the end.
"""

from __future__ import annotations

import dataclasses

from stark_tpu.channel.channel import Channel
from stark_tpu.config import ProverConfig
from stark_tpu.fri.commit import FRIProof, fri_commit
from stark_tpu.merkle.tree import MerkleTree
from stark_tpu.ntt.ntt import coset_evaluate
from stark_tpu.stark.trace import trace_polynomial

# breadcrumb for tests/dryrun: which pipeline the last prove() took —
# "single-fetch", "single-fetch-mesh", "per-phase", or "per-phase-mesh"
# (mirrors tests/test_golden_vectors.py's device-path assertion technique)
LAST_PROVE_PATH: str | None = None


@dataclasses.dataclass
class StarkProof:
    """A complete proof: the transcript plus the public statement.

    `a0` / `a_last` are the first/last trace values (the two universal
    publics); AIRs with more statement data put it in `extra_publics`.
    """

    proof: list[bytes]
    a0: int
    a_last: int
    config: ProverConfig
    air_name: str = "fibonacci-square"
    extra_publics: dict | None = None

    @property
    def publics(self) -> dict:
        if self.air_name == "fibonacci-square":
            base = {"a0": self.a0, "a_last": self.a_last}
        else:
            base = {"input": self.a0, "output": self.a_last}
        if self.extra_publics:
            base.update(self.extra_publics)
        return base

    def size_bytes(self) -> int:
        return sum(len(m) for m in self.proof)

    def compressed_size_bytes(self) -> int:
        """Transcript size under the real node-dedup compression — what
        the reference's `compressed_proof_size` (channel.rs:91-95) was
        meant to report but never did (channel.rs:42-43 pushes verbatim)."""
        from stark_tpu.channel.compress import compressed_size

        return compressed_size(self.proof)

    def _header(self) -> dict:
        return {
            "config": {
                "modulus": self.config.modulus,
                "generator": self.config.generator,
                "log2_trace": self.config.log2_trace,
                "blowup": self.config.blowup,
                "num_queries": self.config.num_queries,
            },
            "air": self.air_name,
            "a0": self.a0,
            "a_last": self.a_last,
            "extra_publics": self.extra_publics,
        }

    def serialize(self, compress: bool = False) -> bytes:
        """JSON (default) or, with `compress=True`, the binary container
        `"STP1" varint(header_len) header_json compressed_transcript`
        with Merkle-node-deduplicated messages (channel/compress.py).
        Both round-trip exactly through :meth:`deserialize`."""
        import json

        if compress:
            from stark_tpu.channel.compress import _varint, compress_messages

            header = json.dumps(self._header()).encode()
            return b"STP1" + _varint(len(header)) + header + compress_messages(self.proof)
        obj = self._header()
        obj["proof"] = [m.hex() for m in self.proof]
        return json.dumps(obj).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "StarkProof":
        import json

        if data[:4] == b"STP1":
            from stark_tpu.channel.compress import _read_varint, decompress_messages

            hlen, pos = _read_varint(data, 4)
            obj = json.loads(data[pos : pos + hlen].decode())
            obj["proof"] = None  # filled from the compressed blob below
            messages = decompress_messages(data[pos + hlen :])
        else:
            obj = json.loads(data.decode())
            messages = None
        c = obj["config"]
        return cls(
            proof=messages if messages is not None
            else [bytes.fromhex(m) for m in obj["proof"]],
            a0=obj["a0"],
            a_last=obj["a_last"],
            config=ProverConfig(
                modulus=c["modulus"],
                generator=c["generator"],
                log2_trace=c["log2_trace"],
                blowup=c["blowup"],
                num_queries=c["num_queries"],
            ),
            air_name=obj.get("air", "fibonacci-square"),
            extra_publics=obj.get("extra_publics"),
        )


_CTX_CACHE: dict = {}


def get_air_context(air, cfg: ProverConfig):
    """Per-(AIR, config) context cache (tables + jitted composer)."""
    key = (air.name, getattr(air, "k", None), cfg)
    ctx = _CTX_CACHE.get(key)
    if ctx is None:
        ctx = air.context(cfg)
        _CTX_CACHE[key] = ctx
    return ctx


def prove(
    cfg: ProverConfig,
    a1: int = 3141592,
    trace=None,
    strict: bool = True,
    mesh=None,
    channel: Channel | None = None,
    air=None,
    metrics=None,
) -> StarkProof:
    """Prove a statement of the given AIR (default: Fibonacci-square with
    secret a_1, the reference's statement).

    With `mesh`, the LDE NTT, Merkle hashing, composition, and FRI folds
    run sharded over the device mesh; the transcript is byte-identical to
    the single-device prove (mesh-shape determinism, SURVEY §4).

    Per-phase metrics (SURVEY §5.5; the reference's only metrics are
    channel.rs:87-95's proof sizes): every prove records phase wall times
    and counters.  With `metrics=None` they accumulate in
    ``stark_tpu.utils.metrics.GLOBAL`` without forcing device syncs; pass
    an explicit MetricsCollector to get an accurate split (each phase's
    outputs are block_until_ready'd)."""
    import jax as _jax

    from stark_tpu.utils import metrics as _metrics_mod

    precise = metrics is not None
    mx = metrics if metrics is not None else _metrics_mod.GLOBAL

    def _sync(*arrs):
        if precise:
            _jax.block_until_ready(arrs)

    if air is None:
        from stark_tpu.stark.air import FibonacciSquareAIR

        air = FibonacciSquareAIR(a1=a1)
    air.validate(cfg)
    if mesh is None:
        # first prove of a config: compile every device program in
        # parallel (no-op off TPU / when already warm, utils/prewarm.py)
        from stark_tpu.utils.prewarm import prewarm_prove

        prewarm_prove(cfg, air)
    p = cfg.modulus
    M = cfg.eval_domain_size
    b = cfg.blowup
    h = cfg.offset
    offsets = [s * b for s in air.shifts]
    max_off = max(offsets)
    from stark_tpu.fields.fp import Fp as _Fp

    ncols = getattr(air, "num_columns", 1)
    width = _Fp.get(p).width

    # -- trace + LDE ------------------------------------------------------
    from stark_tpu.utils.debug import maybe_assert_canonical

    with mx.phase("trace-lde", n=M):
        if trace is None:
            trace = air.build_trace(cfg)
        maybe_assert_canonical(trace, p, "trace")
        publics = air.publics(trace)
        pub_vals = list(publics.values())
        coeffs = trace_polynomial(trace, p)
        if mesh is not None:
            from stark_tpu.dist import dist_coset_evaluate

            f_evals = dist_coset_evaluate(coeffs, p, M, h, mesh)
        else:
            f_evals = coset_evaluate(coeffs, p, M, h)
        maybe_assert_canonical(f_evals, p, "trace-LDE (post-NTT)")
        _sync(f_evals)

    # The single-fetch fast path: trace commit, challenge draws, the whole
    # FRI chain, AND the query phase run device-side with a device-resident
    # Fiat-Shamir state; the host transcript is replayed afterwards from
    # ONE device->host transfer (each fetch costs a ~30-100 ms tunnel round
    # trip).  Phase-accurate channels (checkpoint/resume's ReplayChannel)
    # need transcript bytes present at each phase boundary, so they — and
    # sharded proves — keep the per-phase replay.
    import os as _os

    from stark_tpu.channel import device_query as _dq

    num_folds = air.num_folds(cfg)
    fri_lengths = tuple(M >> k for k in range(num_folds + 1))
    rng = M - max_off
    if channel is None:
        channel = Channel(p)
    single_fetch = (
        not getattr(channel, "phase_accurate", False)
        and not _os.environ.get("STARK_TPU_HOST_QUERIES")
        and not _os.environ.get("STARK_TPU_PHASE_SYNC")
        and _dq.supported(rng, M, fri_lengths, ncols, width)
    )

    if single_fetch:
        if _use_mega(M, mesh, precise, f_evals, width):
            # single-dispatch prove: ONE device program + one packed
            # fetch for everything after trace-LDE (launch-overhead
            # regime, probe_fetch_r4)
            return _prove_mega(
                cfg, air, channel, f_evals, publics, pub_vals, offsets,
                rng, fri_lengths, strict, mx, ncols, width)
        # meshes included (r3 verdict item 4): the fused device-FS chain,
        # dist trees, and the device query program all run on the sharded
        # global arrays — GSPMD partitions the gathers; the transcript-
        # serial SHA chain is tiny and replicated.  One fetch either way.
        return _prove_single_fetch(
            cfg, air, channel, f_evals, publics, pub_vals, offsets, rng,
            fri_lengths, strict, mx, _sync, ncols, mesh)

    global LAST_PROVE_PATH
    LAST_PROVE_PATH = "per-phase" + ("-mesh" if mesh is not None else "")

    channel.mark_phase("trace-commit")
    with mx.phase("trace-commit", leaves=M):
        if mesh is not None:
            from stark_tpu.dist import dist_merkle_tree

            trace_tree = dist_merkle_tree(f_evals, mesh, columns=ncols > 1)
        elif ncols > 1:  # row-leaf commitment over all columns
            trace_tree = MerkleTree.from_columns(f_evals)
        else:
            trace_tree = MerkleTree(f_evals)
        # device-resident Fiat-Shamir for root absorption + alpha draws (one
        # batched fetch instead of a sync per interaction)
        from stark_tpu.channel.device_channel import DeviceFS

        fs = DeviceFS(p, channel.state, mesh=mesh)
        fs.absorb_root(trace_tree.levels[-1][0])
        alphas = tuple(fs.draw() for _ in range(air.num_alphas))
        fs.finalize(channel)

    # -- composition -------------------------------------------------------
    channel.mark_phase("composition")
    with mx.phase("composition"):
        ctx = get_air_context(air, cfg)
        cp = ctx.compose(f_evals, alphas, publics)
        maybe_assert_canonical(cp, p, "composition poly")
        _sync(cp)

    # -- FRI ---------------------------------------------------------------
    with mx.phase("fri-commit", folds=num_folds):
        fri_proof: FRIProof = fri_commit(
            cp, p, h, channel, num_folds=num_folds, strict=strict,
            mesh=mesh,
        )
        maybe_assert_canonical(
            fri_proof.fri_layers, p, "FRI layers (post-fold)")

    # -- queries -----------------------------------------------------------
    # Sharded/phase-accurate proves: device query program when supported
    # (one fetch), else the per-query batched-gather loop.
    channel.mark_phase("queries")
    with mx.phase("queries", num_queries=cfg.num_queries):
        if (
            mesh is None
            and not _os.environ.get("STARK_TPU_HOST_QUERIES")
            and _dq.supported(rng, M, fri_lengths, ncols, width)
        ):
            _dq.get_plan(
                rng, cfg.num_queries, tuple(offsets), M, fri_lengths,
                elem_width=width, num_columns=ncols,
                trace_prev=trace_tree.prev_depth,
                fri_prev=tuple(
                    t.prev_depth for t in fri_proof.fri_merkles),
            ).run(
                channel,
                f_evals,
                trace_tree.levels[:-1],
                fri_proof.fri_layers,
                [t.levels[:-1] for t in fri_proof.fri_merkles],
            )
        else:
            from stark_tpu.fri.commit import (
                collect_query_arrays, emit_plan, open_layout, plan_fri_query)
            from stark_tpu.utils.gather import BatchGather

            # trace value arrays in gather row layout: one array per
            # column, each in open_layout ((M,) u32 pass-through or the
            # (M, 2)-transposed limb pairs for 64-bit fields)
            if ncols > 1:
                cols = tuple(open_layout(f_evals[c]) for c in range(ncols))
            else:
                cols = (open_layout(f_evals),)
            t_axes = tuple(
                1 if lay == "prev" else 0
                for lay in trace_tree.layouts[:-1])
            arrays, slots, open_layers, axes = collect_query_arrays(
                fri_proof.fri_layers,
                fri_proof.fri_merkles,
                extra_arrays=(*cols, *trace_tree.levels[:-1]),
                extra_axes=(0,) * len(cols) + t_axes,
            )
            for _ in range(cfg.num_queries):
                idx = channel.receive_random_int(0, M - max_off - 1, True)
                bg = BatchGather(arrays, mesh=mesh, axes=axes)
                plan = []
                for off in offsets:
                    # one row message: every column's value, 8-byte BE
                    # each (for C == 1 byte-identical to the old single
                    # value send)
                    plan.append(("vrow", [
                        bg.want(slots[id(c_)], idx + off) for c_ in cols]))
                    plan.append(
                        (
                            "p",
                            [
                                bg.want(slots[id(trace_tree.levels[li])], row)
                                for li, row in trace_tree.path_rows(idx + off)
                            ],
                        )
                    )
                plan += plan_fri_query(
                    bg, slots, idx, open_layers, fri_proof.fri_merkles
                )
                bg.run()
                emit_plan(plan, bg, channel)

    return _finish_proof(cfg, air, channel, publics, pub_vals, mx)


def _finish_proof(cfg, air, channel, publics, pub_vals, mx) -> StarkProof:
    proof_bytes = sum(len(m) for m in channel.proof)
    mx.count("proves")
    mx.count("proof_bytes", proof_bytes)
    extra = {k: v for k, v in publics.items()
             if k not in ("a0", "a_last", "input", "output")}
    return StarkProof(
        proof=[bytes(m) for m in channel.proof],
        a0=pub_vals[0],
        a_last=pub_vals[1],
        config=cfg,
        air_name=air.name,
        extra_publics=extra or None,
    )


# The single-dispatch ("mega") prove: everything after trace-LDE — trace
# commit, challenge draws, composition, the whole FRI ladder, the final-
# constant absorb, and the query phase — traced into ONE program, so a
# warm prove is ~4 launches (LDE) + 1 mega launch + 1 packed fetch.
# probe_fetch_r4 measured the multi-launch path's warm wall as launch
# pipelining + one ~27 ms tunnel RTT; fusing removes ~40 launches.
# Only worth it in the latency-bound regime: above _MEGA_MAX_DOMAIN the
# compute dominates and the extra compile budget buys nothing.
_MEGA_MAX_DOMAIN = 1 << 20


def _use_mega(M: int, mesh, precise: bool, values=None,
              width: int = 1) -> bool:
    import os as _os

    if mesh is not None or precise or _os.environ.get("STARK_TPU_NO_MEGA"):
        return False
    if M > int(_os.environ.get("STARK_TPU_MEGA_MAX",
                               str(_MEGA_MAX_DOMAIN))):
        return False
    if _os.environ.get("STARK_TPU_FORCE_MEGA"):
        return True
    if width != 1 and not _os.environ.get("STARK_TPU_WIDE_MEGA"):
        # wide-field (Goldilocks) mega: re-measured on hardware after
        # the r5 rolled-inverse tables + chain breaks
        # (benches/probe_widemega_r5.txt): warm walls are IDENTICAL to
        # the multi-launch single-fetch path (79 vs 80 ms min) while
        # first-prove costs 151.9 s vs 25.2 s — the launch count the
        # mega removes is not the wide path's bottleneck.  Off by
        # default; STARK_TPU_WIDE_MEGA=1 opts in.
        return False
    # TPU-only by default: the mega program's payoff is tunnel launch
    # latency; on CPU it only buys a giant XLA compile (a wide-field
    # periodic spec measured >100 GB of compile RSS on the CPU backend)
    if values is not None:
        try:
            return next(iter(values.devices())).platform == "tpu"
        except Exception:
            pass
    import jax as _jax

    try:
        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _mega_setup(cfg, air, ctx, f_evals, offsets, rng, fri_lengths,
                ncols: int, width: int):
    """Static plan for the mega program: build fns, layouts, the query
    plan, and the Fiat-Shamir log template (kinds in replay order)."""
    import functools as _ft

    from stark_tpu.channel import device_query as _dq
    from stark_tpu.fri.commit import _fold_fn, _inv_domain
    from stark_tpu.hash.pallas_sha import bitrev_prev_depth
    from stark_tpu.merkle.tree import (_use_pallas_build, build_columns_fn,
                                       build_levels_fn, prune_depth_for)

    p, M, h = cfg.modulus, cfg.eval_domain_size, cfg.offset
    num_folds = len(fri_lengths) - 1
    wide = width == 2

    def single_build(n):
        """(build_fn, prev, prune) for a single-codeword tree of n
        leaves, mirroring MerkleTree's dispatch."""
        from stark_tpu.merkle.tree import (_CHUNK_MIN_LOG,
                                           build_levels_chunked_fn)

        prune = prune_depth_for(n)
        if prune and n >= (1 << _CHUNK_MIN_LOG):
            # the one-shot builds materialise the full n*32 B leaf-digest
            # level transiently (>= 4 GiB here) — the measured 2^25+-row
            # OOM; chunked subtrees keep the live set at one chunk
            return build_levels_chunked_fn(n, wide, prune), 0, prune
        if _use_pallas_build(n, f_evals):
            from stark_tpu.hash.pallas_sha import build_tree_bitrev

            return (_ft.partial(build_tree_bitrev, prune=prune),
                    max(0, bitrev_prev_depth(n) - prune), prune)
        return build_levels_fn(n, wide=wide, prune=prune), 0, prune

    if ncols > 1:
        t_prune = prune_depth_for(M)
        trace_build, t_prev = build_columns_fn(M, t_prune), 0
    else:
        trace_build, t_prev, t_prune = single_build(M)

    cw_build, cw_prev, cw_prune = single_build(M)
    folds, layer_builds, inv_doms = [], [], []
    prevs, prunes = [(cw_prev, cw_prune)], []
    size, off = M, int(h) % p
    for _ in range(num_folds):
        folds.append(_fold_fn(p, size))
        inv_doms.append(_inv_domain(p, size, off))
        b, prev_i, prune_i = single_build(size // 2)
        layer_builds.append(b)
        prevs.append((prev_i, prune_i))
        size //= 2
        off = off * off % p

    plan = _dq.get_plan(
        rng, cfg.num_queries, tuple(offsets), M, fri_lengths,
        elem_width=width, num_columns=ncols,
        trace_prev=t_prev, fri_prev=tuple(pr for pr, _ in prevs),
        trace_prune=t_prune, fri_prune=tuple(pn for _, pn in prevs))
    mode = plan._mode(f_evals)
    log_kinds = (["mark:trace-commit", "root"] + ["draw"] * air.num_alphas
                 + ["mark:composition", "mark:fri-commit", "root"]
                 + ["draw", "root"] * num_folds)
    # everything placement/env-dependent that shapes the traced program
    struct_key = (mode, t_prev, t_prune, tuple(prevs))
    return dict(trace_build=trace_build, cw_build=cw_build, folds=folds,
                layer_builds=layer_builds, inv_doms=tuple(inv_doms),
                plan=plan, mode=mode, log_kinds=log_kinds,
                num_folds=num_folds, struct_key=struct_key)


def _get_mega_fn(cfg, air, ctx, setup, ncols: int, width: int,
                 initial: bool):
    """The cached single-dispatch program for one (AIR, config,
    placement) — keyed on everything that shapes the traced structure."""
    key = (setup["struct_key"], initial, cfg.num_queries)
    cache = getattr(ctx, "_mega_fns", None)
    if cache is None:
        cache = ctx._mega_fns = {}
    cached = cache.get(key)
    if cached is not None:
        return cached

    from stark_tpu.channel.device_channel import (absorb_digest,
                                                  absorb_value,
                                                  draw_field_element)
    from stark_tpu.stark.air import _alphas_arr
    from stark_tpu.utils.progcache import cached_jit

    p = cfg.modulus
    plan, mode = setup["plan"], setup["mode"]
    num_alphas, num_folds = air.num_alphas, setup["num_folds"]
    trace_build, cw_build = setup["trace_build"], setup["cw_build"]
    folds, layer_builds = setup["folds"], setup["layer_builds"]

    def mega(state, f_evals, comp_extras, inv_doms):
        import jax.numpy as _jnp

        payloads = []
        t_levels = trace_build(f_evals)
        # a fresh channel's first absorb runs on the EMPTY state — a
        # distinct SHA block layout (device_channel.absorb_digest)
        state = absorb_digest(None if initial else state,
                              t_levels[-1][0])
        payloads.append(t_levels[-1][0])
        alphas = []
        for _ in range(num_alphas):
            v, state = draw_field_element(state, p)
            alphas.append(v)
            payloads.append(v)
        cp = ctx._compose_tables(f_evals, _alphas_arr(tuple(alphas), p),
                                 *comp_extras)
        if width == 2:
            # ONE program holds the whole post-LDE pipeline here; the
            # wide carry-select chains need a barrier per phase or the
            # XLA:CPU LLVM backend compiles for hours (fields/fp64.py)
            cp = ctx.fp.chain_break(cp)
        cw_levels = cw_build(cp)
        state = absorb_digest(state, cw_levels[-1][0])
        payloads.append(cw_levels[-1][0])
        layers, all_levels = [cp], [cw_levels]
        evals = cp
        for i in range(num_folds):
            beta, state = draw_field_element(state, p)
            payloads.append(beta)
            evals = folds[i](evals, beta, inv_doms[i])
            if width == 2:
                evals = ctx.fp.chain_break(evals)
            lv = layer_builds[i](evals)
            state = absorb_digest(state, lv[-1][0])
            payloads.append(lv[-1][0])
            layers.append(evals)
            all_levels.append(lv)
        last = layers[-1]
        if width == 2:
            hi, lo = last[0, 0], last[1, 0]
        else:
            hi, lo = _jnp.zeros((), last.dtype), last[0]
        state = absorb_value(state, hi, lo)
        fstate, (idxs, outs) = plan._run(
            state, f_evals, tuple(t_levels[:-1]), tuple(layers),
            tuple(tuple(lv[:-1]) for lv in all_levels), mode=mode)
        return (tuple(payloads), last, fstate, idxs, outs)

    fn = cached_jit(mega, "mega-prove", (
        type(ctx).__name__, getattr(ctx, "_spec_key", None), p,
        cfg.log2_trace, cfg.blowup, cfg.num_queries, ncols, width,
        initial, setup["struct_key"]))
    cache[key] = fn
    return fn


def _prove_mega(cfg, air, channel, f_evals, publics, pub_vals, offsets,
                rng, fri_lengths, strict, mx, ncols: int, width: int):
    """One device dispatch + one packed fetch for the whole post-LDE
    prove; the host then replays the byte-identical canonical
    transcript (same machinery as the multi-launch single-fetch path)."""
    from stark_tpu.channel.device_channel import DeviceFS
    from stark_tpu.fri.commit import finish_deferred
    from stark_tpu.utils.packfetch import device_get_packed

    global LAST_PROVE_PATH
    LAST_PROVE_PATH = "mega"

    import jax.numpy as _jnp
    import numpy as _np

    p = cfg.modulus
    ctx = get_air_context(air, cfg)
    setup = _mega_setup(cfg, air, ctx, f_evals, offsets, rng, fri_lengths,
                        ncols, width)
    initial = not channel.state
    fn = _get_mega_fn(cfg, air, ctx, setup, ncols, width, initial)

    if initial:  # the state arg is unused when initial (dummy zeros)
        state = _jnp.zeros((8,), _jnp.uint32)
    else:
        state = _jnp.asarray(_np.frombuffer(
            bytes.fromhex(channel.state), dtype=">u4").astype(_np.uint32))
    with mx.phase("prove-device"):
        comp_extras = ctx.compose_args(publics)
        out = fn(state, f_evals, comp_extras, setup["inv_doms"])
    with mx.phase("fetch-replay"):
        payload_h, last_h, fstate_h, idxs_h, outs_h = device_get_packed(out)
        fs = DeviceFS(p, channel.state)
        fs.log = []
        for kind in setup["log_kinds"]:
            if kind.startswith("mark:"):
                fs.log.append(("mark", kind[5:]))
            else:
                fs.log.append((kind, None))
        # replay_fetched consumes fetched values positionally; payload
        # arrays were returned in log order
        fs.replay_fetched(channel, list(payload_h))
        final_value = finish_deferred(p, last_h, channel, strict)
        channel.mark_phase("queries")
        setup["plan"].replay(channel, fstate_h, idxs_h, outs_h)
    del final_value
    return _finish_proof(cfg, air, channel, publics, pub_vals, mx)


def _prove_single_fetch(cfg, air, channel, f_evals, publics, pub_vals,
                        offsets, rng, fri_lengths, strict, mx, _sync,
                        ncols: int = 1, mesh=None):
    """The whole prove after trace-LDE with a device-resident Fiat-Shamir
    state and exactly ONE device->host transfer: trace commit + alpha
    draws + FRI chain + query phase dispatch device-side, then one fetch
    (FS log, final FRI layer, query openings) and a host replay that
    emits the byte-identical canonical transcript.

    Under `mesh` the big arrays stay sharded end-to-end: dist subtree
    Merkle builds, sharded folds, and the device query program's gathers
    partitioned by GSPMD — no per-query host round trips (the r3 sharded
    prove paid 2*num_queries of them, VERDICT r3 missing #3)."""
    import jax as _jax

    from stark_tpu.channel import device_query as _dq
    from stark_tpu.channel.device_channel import DeviceFS
    from stark_tpu.fields.fp import Fp as _Fp
    from stark_tpu.fri.commit import finish_deferred

    p, M, h = cfg.modulus, cfg.eval_domain_size, cfg.offset
    num_folds = len(fri_lengths) - 1

    global LAST_PROVE_PATH
    LAST_PROVE_PATH = "single-fetch" + ("-mesh" if mesh is not None else "")

    with mx.phase("trace-commit", leaves=M):
        if mesh is not None:
            from stark_tpu.dist import dist_merkle_tree

            trace_tree = dist_merkle_tree(f_evals, mesh, columns=ncols > 1)
        else:
            # pruned digest storage (merkle/tree.py): levels > 2^20 nodes
            # are recomputed per query by the device program instead of
            # held in HBM — the difference between a 2^24-row prove
            # fitting on one chip and the r4 12 GB OOM
            from stark_tpu.merkle.tree import prune_depth_for

            prune = prune_depth_for(M)
            trace_tree = (
                MerkleTree.from_columns(f_evals, prune=prune) if ncols > 1
                else MerkleTree(f_evals, prune=prune))
        fs = DeviceFS(p, channel.state, mesh=mesh)
        fs.mark("trace-commit")
        fs.absorb_root(trace_tree.levels[-1][0])
        alphas = tuple(fs.draw() for _ in range(air.num_alphas))
        _sync(trace_tree.levels[-1], fs.state)

    from stark_tpu.utils.debug import maybe_assert_canonical

    fs.mark("composition")
    with mx.phase("composition"):
        ctx = get_air_context(air, cfg)
        cp = ctx.compose(f_evals, alphas, publics)
        maybe_assert_canonical(cp, p, "composition poly")
        _sync(cp)

    with mx.phase("fri-commit", folds=num_folds):
        fri_proof: FRIProof = fri_commit(
            cp, p, h, channel, num_folds=num_folds, strict=strict,
            fs=fs, defer=True, mesh=mesh)
        maybe_assert_canonical(
            fri_proof.fri_layers, p, "FRI layers (post-fold)")
        _sync(fri_proof.fri_layers[-1])

    # the canonical transcript sends the final FRI constant before the
    # query draws — advance the device FS state over that send too
    import jax.numpy as _jnp

    from stark_tpu.channel.device_channel import jit_absorb_value

    last = fri_proof.fri_layers[-1]
    if _Fp.get(p).width == 2:
        hi, lo = last[0, 0], last[1, 0]
    else:
        hi, lo = _jnp.zeros((), last.dtype), last[0]
    fs.state = jit_absorb_value()(fs.state, hi, lo)

    with mx.phase("queries", num_queries=cfg.num_queries):
        plan = _dq.get_plan(rng, cfg.num_queries, tuple(offsets), M,
                            fri_lengths, elem_width=_Fp.get(p).width,
                            num_columns=ncols,
                            trace_prev=trace_tree.prev_depth,
                            fri_prev=tuple(
                                t.prev_depth for t in fri_proof.fri_merkles),
                            trace_prune=trace_tree.prune,
                            fri_prune=tuple(
                                t.prune for t in fri_proof.fri_merkles))
        dev = plan.run_device(
            fs.state, f_evals, trace_tree.levels[:-1],
            fri_proof.fri_layers,
            [t.levels[:-1] for t in fri_proof.fri_merkles],
            # sharded inputs keep the pure-XLA chain (mode 0): the Pallas
            # SHA kernel does not partition under GSPMD
            mode=0 if mesh is not None else None)
        # THE one device->host transfer of the whole prove — packed into
        # a single flat buffer (per-leaf fetches each pay a tunnel round
        # trip; ~100 leaves dominated the warm 2^14 wall, probe_fetch_r4)
        from stark_tpu.utils.packfetch import device_get_packed

        fetch = (fs.payloads(), fri_proof.fri_layers[-1], dev)
        if mesh is not None:
            # multi-process meshes: replicate the (tiny) outputs so every
            # host can fetch them (same as DeviceFS.finalize)
            from stark_tpu.channel.device_channel import _replicate_fn

            fetch = _jax.tree.map(_replicate_fn(mesh), fetch)
        payload_h, final_layer_h, dev_h = device_get_packed(fetch)

    # host replay: canonical transcript bytes (roots, challenge checks),
    # the strict final-constant check + send, then the query openings
    fs.replay_fetched(channel, payload_h)
    fri_proof.final_value = finish_deferred(p, final_layer_h, channel,
                                            strict)
    channel.mark_phase("queries")
    plan.replay(channel, *dev_h)
    return _finish_proof(cfg, air, channel, publics, pub_vals, mx)
