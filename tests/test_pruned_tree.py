"""Pruned Merkle digest storage (merkle/tree.py PRUNE_KEEP_LOG): big
levels are dropped from HBM and their auth-path siblings recomputed from
leaf values inside the device query program — transcripts must stay
byte-identical to full storage, for every family shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stark_tpu.merkle.tree as mt
import stark_tpu.stark.prover as prover_mod
from stark_tpu import ProverConfig
from stark_tpu.merkle.tree import MerkleTree, prune_depth_for
from stark_tpu.stark import prove, verify


@pytest.fixture
def force_prune(monkeypatch):
    """Prune everything above 2^3 nodes so tiny test trees exercise the
    recompute path."""
    monkeypatch.setattr(mt, "PRUNE_KEEP_LOG", 3)
    yield


def test_prune_depth_for(monkeypatch):
    monkeypatch.setattr(mt, "PRUNE_KEEP_LOG", 20)
    assert prune_depth_for(1 << 20) == 0
    assert prune_depth_for(1 << 24) == 4
    assert prune_depth_for((1 << 22) - 1) == 0  # non-power-of-two
    monkeypatch.setenv("STARK_TPU_NO_PRUNE", "1")
    assert prune_depth_for(1 << 24) == 0


def test_pruned_tree_same_root_fewer_levels(force_prune):
    vals = jnp.arange(256, dtype=jnp.uint32)
    full = MerkleTree(vals)
    pruned = MerkleTree(vals, prune=prune_depth_for(256))
    assert pruned.prune == 5
    assert len(pruned.levels) == len(full.levels) - 5
    assert pruned.root() == full.root()
    assert pruned.num_leaves == 256
    for a, b in zip(pruned.levels, full.levels[5:]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pruned_tree_host_paths_refuse(force_prune):
    pruned = MerkleTree(jnp.arange(64, dtype=jnp.uint32), prune=2)
    with pytest.raises(RuntimeError, match="pruned"):
        pruned.get_authentication_path(3)


def test_prune_rejects_bad_shapes():
    with pytest.raises(ValueError, match="prune"):
        MerkleTree(jnp.arange(2, dtype=jnp.uint32), prune=3)


def _transcripts(cfg, air=None, monkeypatch=None):
    mt_keep = mt.PRUNE_KEEP_LOG
    mt.PRUNE_KEEP_LOG = 99
    try:
        full = prove(cfg, air=air)
    finally:
        mt.PRUNE_KEEP_LOG = mt_keep
    assert prover_mod.LAST_PROVE_PATH in ("single-fetch", "mega")
    mt.PRUNE_KEEP_LOG = 3
    try:
        pruned = prove(cfg, air=air)
    finally:
        mt.PRUNE_KEEP_LOG = mt_keep
    assert prover_mod.LAST_PROVE_PATH in ("single-fetch", "mega")
    return full, pruned


def test_pruned_prove_byte_identical_single_column(monkeypatch):
    cfg = ProverConfig(log2_trace=8, blowup=4, num_queries=6)
    full, pruned = _transcripts(cfg)
    assert full.proof == pruned.proof
    assert verify(pruned)


def test_pruned_prove_byte_identical_multi_column(monkeypatch):
    from stark_tpu.stark.air import FibMulAIR

    cfg = ProverConfig(log2_trace=8, blowup=4, num_queries=4)
    full, pruned = _transcripts(cfg, air=FibMulAIR())
    assert full.proof == pruned.proof
    assert verify(pruned)


def test_pruned_prove_byte_identical_goldilocks(monkeypatch):
    cfg = ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                       log2_trace=8, blowup=4, num_queries=4)
    full, pruned = _transcripts(cfg)
    assert full.proof == pruned.proof
    assert verify(pruned)


def test_chunked_build_matches_oneshot_narrow():
    """build_levels_chunked_fn == build_levels_fn[prune:] byte-for-byte
    (the 2^25+ OOM fix must not change a single digest)."""
    n, prune = 1 << 10, 4
    vals = jnp.asarray(np.random.RandomState(7).randint(0, 2**31, n),
                       dtype=jnp.uint32)
    ref = mt.build_levels_fn(n, wide=False, prune=prune)(vals)
    for chunk_log in (prune, 6, 8, 10):
        got = mt.build_levels_chunked_fn(n, False, prune, chunk_log)(vals)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert np.array_equal(np.asarray(a), np.asarray(b)), chunk_log


def test_chunked_build_matches_oneshot_wide():
    n, prune = 1 << 9, 3
    rs = np.random.RandomState(11)
    vals = jnp.asarray(
        np.stack([rs.randint(0, 2**31, n), rs.randint(0, 2**31, n)]),
        dtype=jnp.uint32)
    ref = mt.build_levels_fn(n, wide=True, prune=prune)(vals)
    got = mt.build_levels_chunked_fn(n, True, prune, chunk_log=6)(vals)
    for a, b in zip(got, ref):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_chunked_routing_engages_above_threshold(monkeypatch):
    """MerkleTree routes huge pruned builds through the chunked path and
    the tree is indistinguishable (root, levels, layouts)."""
    monkeypatch.setattr(mt, "_CHUNK_MIN_LOG", 8)
    vals = jnp.arange(512, dtype=jnp.uint32)
    chunked = MerkleTree(vals, prune=3)
    monkeypatch.setattr(mt, "_CHUNK_MIN_LOG", 27)
    normal = MerkleTree(vals, prune=3)
    assert chunked.layouts == ("aos",) * len(chunked.levels)
    assert chunked.root() == normal.root()
    for a, b in zip(chunked.levels, normal.levels):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_chunked_prove_byte_identical(monkeypatch):
    """A prove whose big trees build via chunked subtrees (the 2^25+-row
    single-chip path) is byte-identical to the full-storage transcript,
    for both field widths."""
    for cfg in (ProverConfig(log2_trace=8, blowup=4, num_queries=6),
                ProverConfig(modulus=2**64 - 2**32 + 1, generator=7,
                             log2_trace=8, blowup=4, num_queries=4)):
        monkeypatch.setattr(mt, "PRUNE_KEEP_LOG", 99)
        full = prove(cfg)
        monkeypatch.setattr(mt, "PRUNE_KEEP_LOG", 3)
        monkeypatch.setattr(mt, "_CHUNK_MIN_LOG", 6)  # every tree chunks
        chunked = prove(cfg)
        assert prover_mod.LAST_PROVE_PATH in ("single-fetch", "mega")
        monkeypatch.setattr(mt, "_CHUNK_MIN_LOG", 27)
        assert full.proof == chunked.proof
        assert verify(chunked)
