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
