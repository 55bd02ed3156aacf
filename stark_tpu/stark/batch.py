"""Batched (data-parallel) proving — many statements, one device program.

The DP strategy of SURVEY §2.9: the reference's only parallelism is
rayon threads inside one proof; on TPU the natural data parallelism is a
*batch axis over independent proofs*.  Every device phase — trace scan,
INTT + degree correction, coset NTT, Merkle levels, SHA-256 Fiat-Shamir
absorption/draws, composition, FRI folds — is evaluated for all B proofs
in one set of fused kernels (the batch rides the leading axis; hash
lanes and butterfly lanes fill the VPU), then the B transcripts are
assembled host-side.

Transcripts are BYTE-IDENTICAL to B independent `prove()` calls — tested
— so batching is purely a throughput optimization: ~B x fewer kernel
launches and host round trips per proof.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.channel.channel import Channel
from stark_tpu.channel.device_channel import absorb_digest, draw_field_element
from stark_tpu.config import ProverConfig
from stark_tpu.fields.fp import Fp
from stark_tpu.fri.commit import _inv_domain
from stark_tpu.hash.sha256_jax import sha256_pairs, sha256_u64_leaves
from stark_tpu.merkle.tree import MerkleTree
from stark_tpu.ntt.ntt import get_plan
from stark_tpu.stark.prover import StarkProof, get_air_context
from stark_tpu.stark.trace import _trace_poly_jit

_U32 = jnp.uint32


# -- batched building blocks (leading batch axis B; wide 64-bit fields
# carry their limb plane LEADING, so batched wide values are (2, B, n)
# and the batch is the middle axis — field ops see lanes (B, n)) --------
def _batched_levels(values, wide: bool = False):
    """Merkle levels over axis -1: values (B, n) -> [(B, n, 8), ...].
    Wide values arrive (2, B, n): leaf i hashes the 8-byte BE element
    (hi, lo planes), exactly as the unbatched path.  Multi-column u32
    codewords arrive (B, C, n): leaf i is the row hash
    H(col_0[i] || ... || col_{C-1}[i]) exactly as MerkleTree.from_columns
    (the lane shape (B, n) rides through sha256_row_leaves)."""
    if wide:  # (2, B, n) -> (B, n, 8)
        level = sha256_u64_leaves(values[0], values[1])
    elif values.ndim == 3:  # (B, C, n) -> row leaves (B, n, 8)
        from stark_tpu.hash.sha256_jax import sha256_row_leaves

        # wide=False: the lane shape (B, n) with B == 2 would otherwise
        # be auto-detected as a (C, 2, n) limb-plane input
        level = sha256_row_leaves(jnp.moveaxis(values, 1, 0), wide=False)
    else:
        level = sha256_u64_leaves(jnp.zeros_like(values), values)  # (B, n, 8)
    levels = [level]
    while level.shape[1] > 1:
        level = sha256_pairs(level[:, 0::2], level[:, 1::2])
        levels.append(level)
    return levels


def _batched_fold(f: Fp, evals, beta, inv_dom):
    """FRI fold over axis -1: evals (B, m) [wide: (2, B, m)], beta (B,)
    [wide: (B, 2) as vmapped draws produce], inv_dom (m/2,) [(2, m/2)]."""
    m = evals.shape[-1]
    v = evals[..., : m // 2]
    s = evals[..., m // 2 :]
    if f.width > 1:
        inv2 = f.const(pow(2, f.p - 2, f.p))[:, None, None]
        bb = jnp.moveaxis(beta, -1, 0)[..., None]  # (B, 2) -> (2, B, 1)
        idm = inv_dom[:, None, :]
    else:
        inv2 = _U32(pow(2, f.p - 2, f.p))
        bb = beta[:, None]
        idm = inv_dom[None, :]
    odd = f.mul(f.mul(f.sub(v, s), idm), bb)
    return f.mul(f.add(f.add(v, s), odd), inv2)


def _rebuild_air(air_name, air_param):
    """Air instance from its batch key: declarative specs through the
    builder registry (air_param = sorted param items), legacy classes
    through REGISTRY (air_param = the mimc k, if any)."""
    from stark_tpu.stark.air import REGISTRY
    from stark_tpu.stark.air_builder import lookup_spec

    spec = lookup_spec(air_name)
    if spec is not None:
        return spec(**dict(air_param or ()))
    return (REGISTRY[air_name]() if air_param is None
            else REGISTRY[air_name](k=air_param))


@functools.lru_cache(maxsize=None)
def _batch_commit_jit(air_key, cfg: ProverConfig, batch: int):
    """One jitted program: traces (B, T) -> all commit-phase artifacts."""
    from stark_tpu.stark.air_builder import AirSpec

    p = cfg.modulus
    f = Fp.get(p)
    wide = f.width > 1
    N = cfg.trace_domain_size
    M = cfg.eval_domain_size
    h = cfg.offset
    air = _rebuild_air(*air_key)
    ncols = getattr(air, "num_columns", 1)
    if ncols > 1:
        lead = (batch, ncols)
    elif wide:
        lead = (2, batch)  # limb plane leading, batch middle
    else:
        lead = (batch,)
    trace_poly = _trace_poly_jit(p, N, lead)
    plan_f = get_plan(p, M, False)
    num_folds = air.num_folds(cfg)
    ctx = get_air_context(air, cfg)

    # per-proof composer over positional publics (B, n_pub): declarative
    # specs take all boundary publics in declaration order; legacy
    # families take their statement values in their _compose_tables order
    if isinstance(air, AirSpec):
        pvals = tuple(
            f.const(v) for _, v in sorted(air._param_values.items())
        )

        def composer(lde, al, pubs):
            return ctx._compose_tables(
                lde, tuple(al), tuple(pubs), pvals, ctx.binvs,
                ctx.trans_mult, ctx.periodic_small,
            )
    elif ncols > 1:  # FibMulAIR: pubs (input a0, b0, output b_last)

        def composer(lde, al, pubs):
            return ctx._compose_tables(
                lde, tuple(al), pubs[0], pubs[1], pubs[2],
                ctx.inv_b0, ctx.inv_b1, ctx.trans_mult,
            )
    else:

        def composer(lde, al, pubs):
            return ctx._compose(lde, al, pubs[0], pubs[1])
    off_pows = f.jit_powers(h, N)
    # precompute per-layer inverse domains OUTSIDE the trace (the lru-cached
    # helper must never cache a tracer)
    inv_doms = []
    size, off = M, h
    for _ in range(num_folds):
        inv_doms.append(_inv_domain(p, size, off))
        size //= 2
        off = off * off % p

    def head_body(traces):
        # trace polynomial + LDE, batched over (B[, C]) leading axes
        # (wide: (2, B) — limb plane leads, batch rides the middle);
        # then trace Merkle + FS absorb + alpha draws
        coeffs = trace_poly(traces)                        # (*lead, N)
        shifted = f.mul(coeffs, off_pows)
        padded = jnp.zeros(lead + (M,), _U32).at[..., :N].set(shifted)
        f_evals = plan_f(padded)                           # batched stages
        t_levels = _batched_levels(f_evals, wide=wide)
        state = jax.vmap(lambda d: absorb_digest(None, d))(
            t_levels[-1][:, 0])
        alphas = []
        for _ in range(air.num_alphas):
            a, state = jax.vmap(
                lambda s: draw_field_element(s, p)
            )(state)
            alphas.append(a)                               # (B,) | (B, 2)
        return f_evals, t_levels, state, alphas

    def tail_body(f_evals, state, alphas, publics_dev):
        # composition (vmap the per-proof composer; wide operands have
        # the batch on axis 1, draws/publics have it leading)
        al_arr = jnp.stack(alphas, axis=1)                 # (B, k[, 2])
        cp = jax.vmap(composer,
                      in_axes=(1 if wide else 0, 0, 0),
                      out_axes=1 if wide else 0)(f_evals, al_arr,
                                                 publics_dev)
        if wide:
            # many folds in ONE program (unlike the unbatched path's
            # per-layer jits): the wide carry-select chains need
            # explicit barriers or XLA:CPU's LLVM backend compiles for
            # hours (fields/fp64.py chain-break note)
            cp = f.chain_break(cp)

        # FRI commit chain, batched
        layers = [cp]
        f_levels_all = [_batched_levels(cp, wide=wide)]
        fri_roots = [f_levels_all[0][-1][:, 0]]
        state = jax.vmap(absorb_digest)(state, fri_roots[-1])
        betas = []
        evals = cp
        for k in range(num_folds):
            beta, state = jax.vmap(lambda s: draw_field_element(s, p))(state)
            betas.append(beta)
            evals = _batched_fold(f, evals, beta, inv_doms[k])
            if wide:
                evals = f.chain_break(evals)
            layers.append(evals)
            lv = _batched_levels(evals, wide=wide)
            f_levels_all.append(lv)
            fri_roots.append(lv[-1][:, 0])
            state = jax.vmap(absorb_digest)(state, fri_roots[-1])
        return layers, f_levels_all, fri_roots, betas

    def _assemble(f_evals, t_levels, alphas, tail_out):
        layers, f_levels_all, fri_roots, betas = tail_out
        roots = [t_levels[-1][:, 0]] + list(fri_roots)
        return (f_evals, t_levels, list(layers), list(f_levels_all),
                roots, list(alphas) + list(betas))

    if wide:
        # TWO programs, split at the draws/compose boundary: the fused
        # single program is MISCOMPILED by XLA:CPU for wide fields — it
        # executes forever even at M = 64 while every piece and both
        # halves run in milliseconds (r5 bisect, /tmp/wide9-11 probes).
        # Two dispatches cost microseconds; transcripts are unchanged.
        head_j, tail_j = jax.jit(head_body), jax.jit(tail_body)

        def run_split(traces, publics_dev):
            f_evals, t_levels, state, alphas = head_j(traces)
            tail_out = tail_j(f_evals, state, alphas, publics_dev)
            return _assemble(f_evals, t_levels, alphas, tail_out)

        return run_split

    def run(traces, publics_dev):
        f_evals, t_levels, state, alphas = head_body(traces)
        tail_out = tail_body(f_evals, state, alphas, publics_dev)
        return _assemble(f_evals, t_levels, alphas, tail_out)

    return jax.jit(run)


def prove_batch(cfg: ProverConfig, airs: list) -> list[StarkProof]:
    """Prove B same-config statements with batched device phases.

    `airs`: list of AIR instances of the SAME family/parameters (only the
    per-statement secrets differ).  Returns proofs byte-identical to
    sequential `prove()` calls."""
    from stark_tpu.stark.air_builder import AirSpec

    if not airs:
        return []
    air0 = airs[0]
    air0.validate(cfg)

    def _family_param(a):
        if isinstance(a, AirSpec):
            return tuple(sorted(a._param_values.items()))
        return getattr(a, "k", None)

    if any(a.name != air0.name or _family_param(a) != _family_param(air0)
           for a in airs):
        raise ValueError("prove_batch needs AIRs of one family/parameterization")
    f = Fp.get(cfg.modulus)
    wide = f.width > 1
    ncols = getattr(air0, "num_columns", 1)
    if wide and ncols > 1:
        raise ValueError(
            "prove_batch supports wide (64-bit) fields for single-column "
            "AIRs only; batch multi-column wide statements sequentially")
    B = len(airs)
    p = cfg.modulus
    M = cfg.eval_domain_size
    b = cfg.blowup
    offsets = [s * b for s in air0.shifts]
    max_off = max(offsets)

    per_trace = [a.build_trace(cfg) for a in airs]   # each (T) | (2, T)
    publics = [a.publics(tr) for a, tr in zip(airs, per_trace)]
    traces = jnp.stack(per_trace)                    # (B[, C | 2], T)
    if wide:
        traces = jnp.moveaxis(traces, 1, 0)          # (2, B, T)
    if isinstance(air0, AirSpec):
        pub_order = [bd.public for bd in air0.boundaries]
        pub_rows = [[pb[k] % p for k in pub_order] for pb in publics]
    elif ncols > 1:  # FibMulAIR composer order: (a0, b0, b_last)
        pub_rows = [
            [pb["input"] % p, pb["b0"] % p, pb["output"] % p]
            for pb in publics
        ]
    else:
        pub_rows = [
            [list(pb.values())[0] % p, list(pb.values())[1] % p]
            for pb in publics
        ]
    if wide:
        # (B, n_pub, 2): vmapped composers get (n_pub, 2) rows whose
        # entries are (hi, lo) limb pairs
        publics_dev = jnp.asarray(
            [[[v >> 32, v & 0xFFFFFFFF] for v in row] for row in pub_rows],
            dtype=_U32)
    else:
        publics_dev = jnp.asarray(pub_rows, dtype=_U32)

    air_key = (air0.name, _family_param(air0))
    f_evals, t_levels, layers, f_levels_all, roots, draws = _batch_commit_jit(
        air_key, cfg, B
    )(traces, publics_dev)

    # fetch the tiny commit artifacts for ALL proofs in one transfer
    roots_h, draws_h, finals_h = jax.device_get(
        (roots, draws, layers[-1])
    )

    def _draw_int(d, i) -> int:
        """Host int of proof i's draw — (B,) u32 or (B, 2) limb pairs."""
        row = np.asarray(d[i])
        if row.ndim:
            return int(row[0]) << 32 | int(row[1])
        return int(row)

    proofs = []
    num_folds = air0.num_folds(cfg)
    for i in range(B):
        ch = Channel(p)
        ch.mark_phase("trace-commit")
        ch.send(np.asarray(roots_h[0][i]).astype(">u4").tobytes().hex().encode())
        for k in range(air0.num_alphas):
            el = ch.receive_random_field_element()
            if el.value != _draw_int(draws_h[k], i):
                raise RuntimeError(
                    "batched device Fiat-Shamir diverged from host transcript "
                    f"(alpha {k}: {_draw_int(draws_h[k], i)} != {el.value})"
                )
        ch.mark_phase("fri-commit")
        ch.send(np.asarray(roots_h[1][i]).astype(">u4").tobytes().hex().encode())
        for k in range(num_folds):
            el = ch.receive_random_field_element()
            if el.value != _draw_int(draws_h[air0.num_alphas + k], i):
                raise RuntimeError(
                    "batched device Fiat-Shamir diverged from host transcript "
                    f"(beta {k}: {_draw_int(draws_h[air0.num_alphas + k], i)}"
                    f" != {el.value})"
                )
            ch.send(
                np.asarray(roots_h[2 + k][i]).astype(">u4").tobytes().hex().encode()
            )
        fh = np.asarray(finals_h)
        if wide:  # (2, B, m) -> u64 lane values of proof i
            finals_i = (fh[0, i].astype(np.uint64) << np.uint64(32)
                        | fh[1, i].astype(np.uint64))
        else:
            finals_i = fh[i]
        if not np.all(finals_i == finals_i[0]):
            raise ValueError(
                f"proof {i}: final FRI layer is not constant — composition "
                "degree exceeds 2^num_folds (proof would be rejected)"
            )
        final_value = int(finals_i[0])
        ch.send(final_value.to_bytes(8, "big"))

        # per-proof query phase via the standard (unbatched) machinery:
        # wrap this proof's slices as MerkleTrees over views
        trace_tree = MerkleTree(
            None, device_levels=tuple(lv[i] for lv in t_levels)
        )
        fri_trees = [
            MerkleTree(None, device_levels=tuple(lv[i] for lv in levels))
            for levels in f_levels_all
        ]
        fri_layers = [layer[:, i] if wide else layer[i] for layer in layers]
        from stark_tpu.fri.commit import (
            collect_query_arrays,
            emit_plan,
            open_layout,
            plan_fri_query,
        )
        from stark_tpu.utils.gather import BatchGather

        ch.mark_phase("queries")
        # one gather-row array per trace column; a "vrow" plan entry
        # emits the row message (all C values, 8-byte BE each) — for
        # C == 1 byte-identical to a single value send
        if ncols > 1:
            cols = tuple(open_layout(f_evals[i, c]) for c in range(ncols))
        elif wide:
            cols = (open_layout(f_evals[:, i]),)  # (2, M) -> (M, 2) rows
        else:
            cols = (open_layout(f_evals[i]),)
        t_lv = [lv[i] for lv in t_levels[:-1]]
        arrays, slots, open_layers, axes = collect_query_arrays(
            fri_layers, fri_trees,
            extra_arrays=(*cols, *t_lv),
        )
        for _ in range(cfg.num_queries):
            idx = ch.receive_random_int(0, M - max_off - 1, True)
            bg = BatchGather(arrays, axes=axes)
            plan = []
            for off in offsets:
                plan.append(("vrow", [
                    bg.want(slots[id(c_)], idx + off) for c_ in cols]))
                plan.append(
                    ("p", [bg.want(slots[id(t_lv[li])], row)
                           for li, row in trace_tree.path_rows(idx + off)])
                )
            plan += plan_fri_query(bg, slots, idx, open_layers, fri_trees)
            bg.run()
            emit_plan(plan, bg, ch)

        pub_vals = list(publics[i].values())
        extra = {k: v for k, v in publics[i].items()
                 if k not in ("a0", "a_last", "input", "output")}
        proofs.append(
            StarkProof(
                proof=[bytes(m) for m in ch.proof],
                a0=pub_vals[0],
                a_last=pub_vals[1],
                config=cfg,
                air_name=air0.name,
                extra_publics=extra or None,
            )
        )
    return proofs
