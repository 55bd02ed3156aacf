"""Goldilocks field (fields/fp64.py): pair arithmetic vs python ints,
NTT over the 64-bit field, and an end-to-end prove (VERDICT r1 item 4;
SURVEY §7.1.1's >=2^32 promise — the reference's own envelope stops at
2^32, element.rs:47)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.config import ProverConfig
from stark_tpu.fields.fp import Fp
from stark_tpu.fields.fp64 import GOLDILOCKS, Fp64Goldilocks

P = GOLDILOCKS


@pytest.fixture(scope="module")
def f():
    return Fp.get(P)


def _rand_ints(n, seed=1):
    rs = np.random.RandomState(seed)
    return [int(v) % P for v in rs.randint(0, 2**64, size=n, dtype=np.uint64)]


EDGES = [0, 1, P - 1, P - 2, 1 << 32, (1 << 32) - 1, (1 << 63) + 11]


def test_dispatch():
    assert isinstance(Fp.get(P), Fp64Goldilocks)
    assert Fp.get(P) is Fp.get(P)
    assert Fp.get(P).width == 2
    with pytest.raises(ValueError, match="no device path"):
        Fp.get(2**64 + 13)


def test_add_sub_mul_vs_python(f):
    xs = _rand_ints(48) + EDGES
    ys = _rand_ints(48, seed=2) + list(reversed(EDGES))
    a, b = f.array(xs), f.array(ys)
    add = f.to_ints(np.asarray(f.jit_add(a, b)))
    sub = f.to_ints(np.asarray(f.jit_sub(a, b)))
    mul = f.to_ints(np.asarray(f.jit_mul(a, b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert add[i] == (x + y) % P
        assert sub[i] == (x - y) % P
        assert mul[i] == (x * y) % P


def test_inv_and_pow(f):
    xs = _rand_ints(8) + [1, P - 1, 2]
    a = f.array(xs)
    inv = f.to_ints(np.asarray(f.jit_inv(a)))
    ps = f.to_ints(np.asarray(f.jit_pow_static(a, 12345)))
    for i, x in enumerate(xs):
        assert inv[i] == pow(x, P - 2, P)
        assert ps[i] == pow(x, 12345, P)


def test_tables(f):
    pw = f.to_ints(np.asarray(f.jit_powers(7, 33)))
    assert pw == [pow(7, k, P) for k in range(33)]
    cd = f.to_ints(np.asarray(f.jit_coset_domain(3, 7, 16)))
    assert cd == [3 * pow(7, k, P) % P for k in range(16)]
    g = f.jit_geometric_table(f.array([3, 5]), 6)
    assert f.to_ints(np.asarray(g)) == [
        pow(3, j, P) for j in range(6)] + [pow(5, j, P) for j in range(6)]
    s = f.to_ints(np.asarray(f.jit_sum(f.array(_rand_ints(21)))))
    assert s == [sum(_rand_ints(21)) % P]


def test_np_mulmod_fuzz(f):
    """The host numpy Goldilocks mulmod (128-bit reduction on wrapping
    u64) vs python ints, including boundary-heavy operands."""
    rng = np.random.default_rng(7)
    special = [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32,
               (1 << 32) + 1, P - (1 << 32), (1 << 63) % P]
    a = np.array(special + list(rng.integers(0, P, 500, dtype=np.uint64)),
                 dtype=np.uint64)
    b = np.array(list(reversed(special))
                 + list(rng.integers(0, P, 500, dtype=np.uint64)),
                 dtype=np.uint64)
    got = Fp64Goldilocks._np_mulmod(a, b)
    for i in range(len(a)):
        assert int(got[i]) == int(a[i]) * int(b[i]) % P, i


def test_ntt_roundtrip_and_dft(f):
    from stark_tpu.ntt.ntt import get_plan
    from stark_tpu.ntt.reference_ntt import root_of_unity

    n = 64
    xs = _rand_ints(n, seed=5)
    a = f.array(xs)
    X = f.to_ints(np.asarray(get_plan(P, n, False)(a)))
    w = root_of_unity(P, n)
    for k in (0, 1, 5, n - 1):
        assert X[k] == sum(xs[j] * pow(w, j * k, P) for j in range(n)) % P
    back = f.to_ints(np.asarray(get_plan(P, n, True)(f.array(X))))
    assert back == xs


def test_fourstep_matches_stockham_wide(f):
    """Width-generic XLA four-step (ntt/fourstep.py) == the 1-D Stockham
    plan for the Goldilocks limb-pair representation (VERDICT r1 next-step
    1's plan family, extended to width 2)."""
    from stark_tpu.ntt.fourstep import FourStepPlan
    from stark_tpu.ntt.ntt import NTTPlan

    n = 256
    a = f.array(_rand_ints(n, seed=11))
    for inverse in (False, True):
        ref = NTTPlan(P, n, inverse)(a)
        got = FourStepPlan(P, n, inverse)(a)
        assert got.shape == (2, n)
        assert jnp.array_equal(ref, got)


def test_get_plan_dispatches_wide_fourstep():
    from stark_tpu.ntt.fourstep import FOURSTEP_MIN, FourStepPlan
    from stark_tpu.ntt.ntt import get_plan

    plan = get_plan(P, FOURSTEP_MIN, False)
    assert isinstance(plan, FourStepPlan)


def test_wide_merkle_matches_host_oracle(f):
    from stark_tpu.merkle.tree import MerkleTree, merkle_root_host

    vals = _rand_ints(32, seed=7)
    t = MerkleTree(f.array(vals))
    assert t.root() == merkle_root_host(vals)
    path = t.get_authentication_path(5)
    assert MerkleTree.validate(t.root(), path, 5, vals[5].to_bytes(8, "big"),
                               32)


def test_goldilocks_host_queries_match_device(monkeypatch):
    """The host batched-gather query loop must emit the same bytes as the
    device query program for the 64-bit field (wide layers enter the
    gather transposed — open_layout)."""
    from stark_tpu.stark.prover import prove

    cfg = ProverConfig(modulus=P, generator=7, log2_trace=5, blowup=4,
                       num_queries=3)
    fast = prove(cfg, a1=31415)
    monkeypatch.setenv("STARK_TPU_HOST_QUERIES", "1")
    host = prove(cfg, a1=31415)
    assert fast.proof == host.proof


@pytest.mark.parametrize("nd", [2, 4])
def test_goldilocks_dist_ntt_and_merkle(f, nd):
    """Wide (2, n) limb-pair codewords through the distributed four-step
    NTT (limb plane rides unsharded ahead of the matrix axes) and the
    sharded Merkle build — byte-identical to single-device."""
    import jax

    from stark_tpu.dist import dist_intt, dist_merkle_tree, dist_ntt, \
        make_mesh
    from stark_tpu.merkle.tree import MerkleTree
    from stark_tpu.ntt.ntt import get_plan

    devs = jax.local_devices(backend="cpu")
    if len(devs) < nd:
        pytest.skip(f"needs {nd} cpu devices")
    mesh = make_mesh(nd, devices=devs[:nd])
    n = 1 << 10
    rng = np.random.default_rng(1)
    vals = rng.integers(0, P, n, dtype=np.uint64)
    x = jnp.asarray(np.stack([(vals >> np.uint64(32)).astype(np.uint32),
                              (vals & np.uint64(0xFFFFFFFF)).astype(
                                  np.uint32)]))
    y = dist_ntt(x, P, mesh)
    assert np.array_equal(np.asarray(y), np.asarray(get_plan(P, n, False)(x)))
    yi = dist_intt(jnp.asarray(np.asarray(y)), P, mesh)
    assert np.array_equal(np.asarray(yi), np.asarray(x))
    assert dist_merkle_tree(x, mesh).root() == MerkleTree(x).root()


def test_goldilocks_sharded_prove_byte_identical():
    import jax

    from stark_tpu.dist import make_mesh
    from stark_tpu.stark.prover import prove

    devs = jax.local_devices(backend="cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 cpu devices")
    mesh = make_mesh(4, devices=devs[:4])
    cfg = ProverConfig(modulus=P, generator=7, log2_trace=6, blowup=4,
                       num_queries=4)
    assert prove(cfg, a1=3141592, mesh=mesh).proof == \
        prove(cfg, a1=3141592).proof


def test_goldilocks_prove_verify_end_to_end():
    from stark_tpu.stark.prover import prove
    from stark_tpu.stark.verifier import verify

    cfg = ProverConfig(modulus=P, generator=7, log2_trace=6, blowup=4,
                       num_queries=2)
    pr = prove(cfg, a1=3141592)
    assert verify(pr, expected_config=cfg)
    # determinism: same statement, same bytes
    pr2 = prove(cfg, a1=3141592)
    assert [bytes(m) for m in pr.proof] == [bytes(m) for m in pr2.proof]
    # serialization roundtrip
    from stark_tpu.stark.prover import StarkProof

    back = StarkProof.deserialize(pr.serialize())
    assert verify(back, expected_config=cfg)
    # tampering rejected
    import copy

    from stark_tpu.stark.verifier import StarkVerificationError

    bad = copy.deepcopy(pr)
    bad.proof[2] = bytes([bad.proof[2][0] ^ 1]) + bad.proof[2][1:]
    with pytest.raises(StarkVerificationError):
        verify(bad, expected_config=cfg)
