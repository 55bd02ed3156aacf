"""FRI commit / fold / decommit — prover side.

TPU-native rebuild of the reference's disabled FRI module
(reference: src/fri/fri_commit.rs — written but non-compiling, SURVEY
§2.8).  Same protocol, two structural upgrades:

* **Evaluation-form folding.**  The reference folds coefficients and then
  re-evaluates the folded polynomial pointwise per layer, O(n * deg)
  (fri_commit.rs:53-65).  Here each fold is a single O(n) fused device op
  on the evaluations:

      next[i] = (E[i] + E[i + m/2]) / 2  +  beta * (E[i] - E[i + m/2]) / (2 * D[i])

  which equals even(x^2) + beta * odd(x^2) — identical to the reference's
  ``next_fri_polynomial`` (fri_commit.rs:32-50) composed with
  ``next_fri_domain`` (half + square, fri_commit.rs:18-24).
* **Phase-batched Fiat-Shamir.**  Per layer the device computes fold +
  Merkle levels; only the 32-byte root crosses to host, the channel
  absorbs it and derives beta (host hashing), and beta returns as one
  scalar.  This is the minimal serialization the protocol allows
  (SURVEY §3.3).

Transcript framing is reference-exact: Merkle roots are sent as the
**UTF-8 bytes of the lowercase hex string** (``root().to_vec()``,
fri_commit.rs:86,100), field values as 8-byte BE (fri_commit.rs:114,156).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.channel.channel import Channel
from stark_tpu.fields.fp import Fp
from stark_tpu.merkle.tree import MerkleTree
from stark_tpu.ntt.reference_ntt import root_of_unity

_U32 = jnp.uint32


def _fold_fn(p: int, m: int):
    """The raw fold for layer size m: (evals[m], beta, inv_half_domain[m/2])
    -> evals[m/2]."""
    f = Fp.get(p)
    inv2 = f.const(pow(2, p - 2, p))
    if f.width > 1:
        inv2 = inv2[:, None]

    def fold(evals, beta, inv_dom):
        v = evals[..., : m // 2]
        s = evals[..., m // 2 :]
        odd = f.mul(f.mul(f.sub(v, s), inv_dom), beta)
        return f.mul(f.add(f.add(v, s), odd), inv2)

    return fold


@functools.lru_cache(maxsize=None)
def _fold_jit(p: int, m: int):
    return jax.jit(_fold_fn(p, m))


@functools.lru_cache(maxsize=None)
def _layer_jit(p: int, m: int, pallas: bool = False, interpret: bool = False,
               prune: int = 0):
    """One WHOLE FRI layer as a single program: draw beta from the device
    Fiat-Shamir state, fold the size-m evaluations, build the size-m/2
    Merkle tree, absorb its root.  (state, evals, inv_dom) ->
    (folded, levels..., state', beta).

    One compile + one dispatch where the unfused chain costs four of each
    — the r1 cold-compile cliff (VERDICT #3) was mostly program COUNT,
    and warm per-dispatch latency on the tunneled TPU is ~10 ms.

    With `pallas=True` the tree inside is the bitrev Pallas build
    (hash/pallas_sha.build_tree_bitrev nests fine under jit — the r2
    split path existed only for the value-placement check, which the
    caller now does on the concrete evals); levels come back in the
    bitrev layouts (merkle.tree.bitrev_layouts(m // 2))."""
    from stark_tpu.channel.device_channel import absorb_digest, \
        draw_field_element
    from stark_tpu.merkle.tree import build_levels_fn

    f = Fp.get(p)
    fold = _fold_fn(p, m)
    if pallas:
        from stark_tpu.hash.pallas_sha import build_tree_bitrev

        build = functools.partial(build_tree_bitrev, interpret=interpret,
                                  prune=prune)
    else:
        build = build_levels_fn(m // 2, wide=f.width > 1, prune=prune)

    def step(state, evals, inv_dom):
        beta, state = draw_field_element(state, p)
        folded = fold(evals, beta, inv_dom)
        levels = build(folded)
        state = absorb_digest(state, levels[-1][0])
        return (folded, *levels, state, beta)

    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(step, "fri-layer", (p, m, pallas, interpret, prune))


@functools.lru_cache(maxsize=None)
def _inv_domain(p: int, m: int, offset: int):
    """[1 / (offset * w^i)] for i < m/2, w the canonical order-m root."""
    f = Fp.get(p)
    w = root_of_unity(p, m)
    w_inv = pow(w, p - 2, p)
    off_inv = pow(offset % p, p - 2, p)
    return f.jit_coset_domain(off_inv, w_inv, m // 2)


@dataclasses.dataclass
class FRIProof:
    """All layers + trees + final constant (mirrors FRIProof,
    fri_commit.rs:8-13; final_poly is the constant value since folding
    runs to degree 0).  In deferred mode (fri_commit(..., defer=True))
    `final_value` is None until the caller fetches the last layer and
    calls :func:`finish_deferred`."""

    fri_layers: list[jax.Array]
    fri_merkles: list[MerkleTree]
    final_value: int | None
    offsets: list[int]  # coset offset per layer (o, o^2, o^4, ...)


def finish_deferred(p: int, final_vals_host, channel: Channel,
                    strict: bool = True) -> int:
    """Strict-constant check + the final-value send for a deferred
    fri_commit, given the already-fetched last layer."""
    final_ints = Fp.get(p).to_ints(final_vals_host)
    final_value = final_ints[0]
    if strict and any(v != final_value for v in final_ints):
        raise ValueError(
            "FRI did not fold to a constant — codeword degree exceeds "
            "2^num_folds (proof would be rejected); pass strict=False to "
            "emit the doomed transcript anyway (testing only)"
        )
    channel.send(final_value.to_bytes(8, "big"))
    return final_value


def fri_commit(
    evals,
    p: int,
    offset: int,
    channel: Channel,
    num_folds: int | None = None,
    strict: bool = True,
    mesh=None,
    fs=None,
    defer: bool = False,
) -> FRIProof:
    """Commit phase (fri_commit.rs:72-122): Merkle each layer, absorb the
    root, draw beta, fold; finally send the constant.

    `evals`: canonical uint32 evaluations on {offset * w^i : i < n}.
    `num_folds`: folds to perform; defaults to log2(n) - 3 (stop at a
    size-8 layer like STARK-101's 8192 -> 8).

    `fs`: an ACTIVE DeviceFS to continue (single-fetch prove path); when
    None a fresh one is created from channel.state.  With `defer=True`
    nothing touches the host channel — no fetch, no replay, no final
    send; the caller fetches fs.payloads() + the last layer and calls
    :func:`finish_deferred` (stark/prover.py's one-fetch fast path).
    """
    n = int(evals.shape[-1])
    if n & (n - 1):
        raise ValueError("FRI domain size must be a power of two")
    if num_folds is None:
        num_folds = max(n.bit_length() - 4, 0)  # log2(n) - 3
    if num_folds >= n.bit_length():
        raise ValueError(f"cannot fold size {n} domain {num_folds} times")

    def _tree(vals):
        if mesh is not None:
            from stark_tpu.dist.merkle import dist_merkle_tree

            return dist_merkle_tree(vals, mesh)
        from stark_tpu.merkle.tree import prune_depth_for as _pdf

        return MerkleTree(
            vals, prune=_pdf(int(vals.shape[-1])) if defer else 0)

    from stark_tpu.channel.device_channel import DeviceFS

    evals = jnp.asarray(evals, dtype=_U32)
    offset = int(offset) % p
    layers = [evals]
    offsets = [offset]
    trees = [_tree(evals)]

    # The whole commit->challenge->fold chain runs with a device-resident
    # Fiat-Shamir state: no host sync per layer (each costs a full round
    # trip); the canonical host transcript is replayed from ONE fetch.
    own_fs = fs is None
    if own_fs:
        if defer:
            raise ValueError(
                "defer=True needs the caller's DeviceFS (fs=...): a "
                "locally-created one would be dropped and its roots/betas "
                "never replayed into the transcript")
        channel.mark_phase("fri-commit")
        fs = DeviceFS(p, channel.state, mesh=mesh)
    else:
        fs.mark("fri-commit")
    fs.absorb_root(trees[0].levels[-1][0])

    from stark_tpu.merkle.tree import _use_pallas_build

    # Fused-layer envelope: round 2 gated fusion above 2^10 leaves on TPU
    # after one remote-compile hang; benches/probe_fuse_r3.txt re-ran the
    # probe to conclusion on hardware (2026-08-19) — every fused
    # draw+fold+tree+absorb program m=2^10..2^17 compiles in 3.9-8.7 s,
    # including the old m=2^12 hang suspect, so every non-sharded layer
    # whose tree rides the XLA build is now fused (one program + one
    # dispatch per layer).  Pallas-tree-sized layers keep the split path
    # (the Mosaic tree kernels don't nest in the fused program).
    from stark_tpu.merkle.tree import prune_depth_for

    size, off = n, offset
    for _ in range(num_folds):
        inv_dom = _inv_domain(p, size, off)
        if mesh is None:
            # fused draw+fold+tree+absorb: one program, one dispatch (the
            # Pallas bitrev tree nests in the fused program when the
            # layer is big enough).  Pruned digest storage only on the
            # deferred/single-fetch path — the per-query host fallbacks
            # need every level present.
            prune = prune_depth_for(size // 2) if defer else 0
            use_pallas = _use_pallas_build(size // 2, evals)
            out = _layer_jit(p, size, use_pallas, prune=prune)(
                fs.state, evals, inv_dom)
            evals, levels, new_state, beta = out[0], out[1:-2], out[-2], out[-1]
            fs.state = new_state
            fs.log.append(("draw", beta))
            fs.log.append(("root", levels[-1][0]))
            from stark_tpu.merkle.tree import bitrev_layouts

            tree = MerkleTree(
                None, device_levels=tuple(levels),
                layouts=(bitrev_layouts(size // 2)[prune:] if use_pallas
                         else None),
                prune=prune)
        else:  # sharded: per-step dist trees, split dispatches
            beta = fs.draw()  # device scalar, feeds the fold directly
            evals = _fold_jit(p, size)(evals, beta, inv_dom)
            tree = _tree(evals)
            fs.absorb_root(tree.levels[-1][0])
        size //= 2
        off = off * off % p
        layers.append(evals)
        offsets.append(off)
        trees.append(tree)

    if defer:
        return FRIProof(layers, trees, None, offsets)
    (final_vals,) = fs.finalize(channel, extras=[layers[-1]])
    final_value = finish_deferred(p, np.asarray(final_vals), channel, strict)
    return FRIProof(layers, trees, final_value, offsets)


def open_layout(layer):
    """A value array in BatchGather's row layout: wide (2, n) limb-pair
    arrays transpose to (n, 2) so a gathered row is one ELEMENT (both
    limbs); u32 arrays pass through.  (FRI layers are never multi-column
    — the composition polynomial is a single codeword.)"""
    return layer.T if layer.ndim == 2 else layer


def collect_query_arrays(fri_layers, fri_merkles, extra_arrays=(),
                         extra_axes=None):
    """Deduplicated tuple of every device array a query opening can touch
    (layer values in open_layout + all tree levels), with an id->slot map
    for BatchGather.  Returns (arrays, slots, open_layers, axes): index
    layer value gathers with `slots[id(open_layers[i])]`; `axes` is the
    per-array gather axis (1 for plane-form bitrev Merkle levels,
    0 otherwise) to pass to BatchGather."""
    arrays: list = []
    axes: list = []
    slots: dict[int, int] = {}

    def add(a, axis=0):
        if id(a) not in slots:
            slots[id(a)] = len(arrays)
            arrays.append(a)
            axes.append(axis)
        return a

    for i, a in enumerate(extra_arrays):
        add(a, extra_axes[i] if extra_axes is not None else 0)
    open_layers = [add(open_layout(layer)) for layer in fri_layers]
    for tree in fri_merkles:
        for li, lv in enumerate(tree.levels[:-1]):
            add(lv, 1 if tree.layouts[li] == "prev" else 0)
    return tuple(arrays), slots, open_layers, tuple(axes)


def plan_fri_query(bg, slots, index: int, open_layers, fri_merkles) -> list:
    """Queue one query's openings (fri_commit.rs:137-165 order: per layer
    value, auth path, sibling, sibling path; the len==1 quirk — final
    value sent, then re-sent as idx/sibling, fri_commit.rs:146-148 — is
    replicated for parity).  `open_layers`: the layer arrays in
    open_layout (axis 0 = elements).  Returns the send plan for
    emit_plan."""
    plan = []
    for layer, tree in zip(open_layers, fri_merkles):
        length = int(layer.shape[0])
        if length == 1:
            plan.append(("v", bg.want(slots[id(layer)], 0)))
        idx = index % length
        sib = (idx + length // 2) % length
        for j in (idx, sib):
            plan.append(("v", bg.want(slots[id(layer)], j)))
            plan.append(
                (
                    "p",
                    [
                        bg.want(slots[id(tree.levels[li])], row)
                        for li, row in tree.path_rows(j)
                    ],
                )
            )
    return plan


def emit_plan(plan, bg, channel: Channel) -> None:
    """Send a resolved plan in transcript order (8-byte BE values, row
    messages of concatenated column values, concatenated sibling
    digests)."""
    for kind, h in plan:
        if kind == "v":
            channel.send(bg.value_u64(h).to_bytes(8, "big"))
        elif kind == "vrow":  # multi-column trace row opening
            channel.send(
                b"".join(bg.value_u64(x).to_bytes(8, "big") for x in h))
        else:
            channel.send(b"".join(bg.digest(x) for x in h))


def decommit_fri_layers(
    index: int,
    fri_layers: list,
    fri_merkles: list[MerkleTree],
    channel: Channel,
    _collected=None,
) -> None:
    """Per-query decommitment — one batched device gather + ONE
    device->host transfer for the whole query (tunneled-TPU friendly)."""
    from stark_tpu.utils.gather import BatchGather

    arrays, slots, open_layers, axes = _collected or collect_query_arrays(
        fri_layers, fri_merkles)
    bg = BatchGather(arrays, axes=axes)
    plan = plan_fri_query(bg, slots, index, open_layers, fri_merkles)
    bg.run()
    emit_plan(plan, bg, channel)


def decommit_fri(
    num_queries: int,
    max_index: int,
    fri_layers: list,
    fri_merkles: list[MerkleTree],
    channel: Channel,
) -> None:
    """Query phase (fri_commit.rs:168-179): draw each index from the
    channel (shown in proof), then decommit all layers.

    When every layer is a power of two, the whole phase runs as ONE
    device program + one fetch (channel/device_query.py); otherwise (or
    under STARK_TPU_HOST_QUERIES) it falls back to one batched gather +
    fetch per query."""
    import os

    channel.mark_phase("fri-query")
    lengths = tuple(int(l.shape[-1]) for l in fri_layers)
    rng = max_index + 1
    width = Fp.get(int(channel.modulus)).width
    from stark_tpu.channel import device_query as _dq

    if not os.environ.get("STARK_TPU_HOST_QUERIES") and _dq.supported(
            rng, None, lengths, elem_width=width):
        _dq.get_plan(rng, num_queries, (), None, lengths,
                     elem_width=width,
                     fri_prev=tuple(t.prev_depth for t in fri_merkles)).run(
            channel, None, (), fri_layers,
            [t.levels[:-1] for t in fri_merkles])
        return
    collected = collect_query_arrays(fri_layers, fri_merkles)
    for _ in range(num_queries):
        idx = channel.receive_random_int(0, max_index, True)
        decommit_fri_layers(idx, fri_layers, fri_merkles, channel, collected)
