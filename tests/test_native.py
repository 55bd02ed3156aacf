"""Native host engine tests (C++ sha256/merkle/channel vs hashlib and the
device implementations)."""

import hashlib

import numpy as np
import pytest

from stark_tpu.native import (
    channel_absorb,
    get_lib,
    merkle_build_host,
    merkle_validate,
    sha256,
)
from stark_tpu.merkle import MerkleTree, merkle_root_host


def test_library_builds():
    assert get_lib() is not None, "g++ toolchain should be present in CI"


@pytest.mark.parametrize("n", [0, 1, 55, 56, 63, 64, 65, 127, 128, 1000])
def test_sha256_matches_hashlib(n):
    msg = bytes(range(256)) * (n // 256 + 1)
    msg = msg[:n]
    assert sha256(msg) == hashlib.sha256(msg).digest()


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 33, 256])
def test_merkle_build_matches_oracle(n):
    vals = (np.arange(n, dtype=np.uint64) * 2654435761) % (1 << 32)
    digs = merkle_build_host(vals)
    assert digs[-1].hex() == merkle_root_host(vals.tolist())


def test_native_validate_agrees_with_device_tree():
    import jax.numpy as jnp

    vals = np.arange(1, 65, dtype=np.uint32)
    tree = MerkleTree(jnp.asarray(vals))
    root = tree.root()
    for idx in [0, 17, 63]:
        path = tree.get_authentication_path(idx)
        leaf = int(vals[idx]).to_bytes(8, "big")
        assert merkle_validate(root, path, idx, leaf, 64)
        assert not merkle_validate(root, path, idx, (999).to_bytes(8, "big"), 64)
        assert not merkle_validate(root, path[:-32], idx, leaf, 64)


def test_channel_absorb_matches_hashlib():
    s = ""
    for msg in [b"", b"\x00", b"abc", bytes(range(256))]:
        s_new = channel_absorb(s, msg)
        assert s_new == hashlib.sha256((s + msg.hex()).encode()).hexdigest()
        s = s_new


def test_validate_rejects_bad_root_hex():
    assert not merkle_validate("zz" * 32, b"", 0, b"\0" * 8, 1)
