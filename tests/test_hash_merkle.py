"""SHA-256 device kernel vs hashlib; Merkle tree vs host oracle; auth path
validation (the APIs the reference needed but never implemented,
SURVEY §2.5)."""

import hashlib

import numpy as np
import pytest

import jax.numpy as jnp

from stark_tpu.hash import jit_leaves, jit_pairs, digest_to_bytes
from stark_tpu.merkle import MerkleTree, merkle_root_host
from stark_tpu.config import DEFAULT_MODULUS


def _digest_rows_to_bytes(arr):
    return [b"".join(int(x).to_bytes(4, "big") for x in row) for row in np.asarray(arr)]


class TestSha256Device:
    def test_leaf_hash_matches_hashlib(self):
        vals = np.array([0, 1, 2, 12345678, DEFAULT_MODULUS - 1, 0xFFFFFFFF],
                        dtype=np.uint32)
        got = _digest_rows_to_bytes(
            jit_leaves()(jnp.zeros_like(jnp.asarray(vals)), jnp.asarray(vals))
        )
        want = [hashlib.sha256(int(v).to_bytes(8, "big")).digest() for v in vals]
        assert got == want

    def test_leaf_hash_u64_high_word(self):
        hi = np.array([0x12345678], dtype=np.uint32)
        lo = np.array([0x9ABCDEF0], dtype=np.uint32)
        got = _digest_rows_to_bytes(jit_leaves()(jnp.asarray(hi), jnp.asarray(lo)))
        want = [hashlib.sha256(bytes.fromhex("123456789abcdef0")).digest()]
        assert got == want

    def test_row_leaves_match_hashlib_and_u64(self):
        """Multi-column row leaves H(col0||col1||... 8-byte BE each) vs
        hashlib; C = 1 coincides with sha256_u64_leaves."""
        import hashlib

        import jax.numpy as jnp

        from stark_tpu.hash.sha256_jax import (sha256_row_leaves,
                                               sha256_u64_leaves)

        rng = np.random.default_rng(5)
        for C in (1, 2, 3, 6):
            cols = rng.integers(0, 2**32, (C, 9), dtype=np.uint32)
            got = np.asarray(sha256_row_leaves(jnp.asarray(cols)))
            for i in range(9):
                msg = b"".join(int(cols[c][i]).to_bytes(8, "big")
                               for c in range(C))
                want = hashlib.sha256(msg).digest()
                assert got[i].astype(">u4").tobytes() == want, (C, i)
            if C == 1:
                u64 = np.asarray(sha256_u64_leaves(
                    jnp.zeros(9, jnp.uint32), jnp.asarray(cols[0])))
                assert np.array_equal(got, u64)
        with pytest.raises(ValueError):
            sha256_row_leaves(jnp.zeros((8, 4), jnp.uint32))

    def test_multicolumn_tree_matches_host_oracle(self):
        from stark_tpu.merkle.tree import merkle_root_host_rows

        rng = np.random.default_rng(6)
        for C, n in ((2, 64), (3, 33), (5, 1024)):
            cols = rng.integers(0, 2**31, (C, n), dtype=np.uint32)
            t = MerkleTree.from_columns(jnp.asarray(cols))
            assert t.root() == merkle_root_host_rows(cols.tolist()), (C, n)
            for idx in (0, n - 1, n // 2):
                msg = b"".join(int(cols[c][idx]).to_bytes(8, "big")
                               for c in range(C))
                assert MerkleTree.validate(
                    t.root(), t.get_authentication_path(idx), idx, msg, n)

    def test_pair_hash_matches_hashlib(self):
        rng = np.random.default_rng(0)
        l = rng.integers(0, 1 << 32, size=(5, 8), dtype=np.uint64).astype(np.uint32)
        r = rng.integers(0, 1 << 32, size=(5, 8), dtype=np.uint64).astype(np.uint32)
        got = _digest_rows_to_bytes(jit_pairs()(jnp.asarray(l), jnp.asarray(r)))
        for i in range(5):
            lb = b"".join(int(x).to_bytes(4, "big") for x in l[i])
            rb = b"".join(int(x).to_bytes(4, "big") for x in r[i])
            assert got[i] == hashlib.sha256(lb + rb).digest()

    def test_large_batch(self):
        vals = np.arange(4096, dtype=np.uint32)
        got = _digest_rows_to_bytes(
            jit_leaves()(jnp.zeros(4096, jnp.uint32), jnp.asarray(vals))
        )
        for i in [0, 1, 777, 4095]:
            assert got[i] == hashlib.sha256(int(vals[i]).to_bytes(8, "big")).digest()


class TestMerkle:
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 16, 100, 256])
    def test_root_matches_host_oracle(self, n):
        rng = np.random.default_rng(n)
        vals = rng.integers(0, DEFAULT_MODULUS, size=n, dtype=np.uint64).astype(np.uint32)
        tree = MerkleTree(vals)
        assert tree.root() == merkle_root_host(vals.tolist())

    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 33, 64, 100])
    def test_auth_paths_validate(self, n):
        rng = np.random.default_rng(n + 1000)
        vals = rng.integers(0, DEFAULT_MODULUS, size=n, dtype=np.uint64).astype(np.uint32)
        tree = MerkleTree(vals)
        root = tree.root()
        for idx in {0, n // 2, n - 1}:
            path = tree.get_authentication_path(idx)
            leaf = int(vals[idx]).to_bytes(8, "big")
            assert MerkleTree.validate(root, path, idx, leaf, n), (n, idx)

    def test_validate_rejects_wrong_leaf(self):
        vals = np.arange(1, 9, dtype=np.uint32)
        tree = MerkleTree(vals)
        path = tree.get_authentication_path(3)
        assert not MerkleTree.validate(
            tree.root(), path, 3, (99).to_bytes(8, "big"), 8
        )

    def test_validate_rejects_wrong_index(self):
        vals = np.arange(1, 9, dtype=np.uint32)
        tree = MerkleTree(vals)
        path = tree.get_authentication_path(3)
        leaf = (4).to_bytes(8, "big")  # value at idx 3
        assert not MerkleTree.validate(tree.root(), path, 2, leaf, 8)

    def test_validate_rejects_truncated_path(self):
        vals = np.arange(1, 17, dtype=np.uint32)
        tree = MerkleTree(vals)
        path = tree.get_authentication_path(5)
        leaf = (6).to_bytes(8, "big")
        assert not MerkleTree.validate(tree.root(), path[:-32], 5, leaf, 16)
        assert not MerkleTree.validate(tree.root(), path + b"\0" * 32, 5, leaf, 16)

    def test_single_leaf_tree(self):
        tree = MerkleTree(np.array([42], dtype=np.uint32))
        assert tree.root() == hashlib.sha256((42).to_bytes(8, "big")).hexdigest()
        assert tree.get_authentication_path(0) == b""
        assert MerkleTree.validate(tree.root(), b"", 0, (42).to_bytes(8, "big"), 1)

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            MerkleTree(np.array([], dtype=np.uint32))

    def test_out_of_range_path_raises(self):
        tree = MerkleTree(np.arange(4, dtype=np.uint32))
        with pytest.raises(IndexError):
            tree.get_authentication_path(4)
