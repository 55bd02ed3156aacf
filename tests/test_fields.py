"""Field layer tests.

Covers the reference's 18 scalar unit tests over GF(7)
(reference: src/fields/element.rs:149-290) plus batched-vs-oracle property
tests for the uint32 Montgomery device path over several moduli, including
the worst-case envelope p just under 2^32.
"""

import numpy as np
import pytest

from stark_tpu.fields import FieldElement, Fp, fe
from stark_tpu.fields.fp import _mulhilo32
from stark_tpu.config import DEFAULT_MODULUS, TEST_MODULUS

import jax.numpy as jnp

M7 = 7

# All device-path moduli we exercise: tiny, test 2-adic, mersenne31,
# stark101, and the largest odd 32-bit value that is prime-ish enough for
# the ring ops we test (add/sub/mul/redc identities need no primality).
MODULI = [7, 17, TEST_MODULUS, (1 << 31) - 1, DEFAULT_MODULUS, 4294967291]


# ---------------------------------------------------------------------------
# scalar mirror: the reference's own test battery (element.rs:149-290)
# ---------------------------------------------------------------------------
class TestScalarMirror:
    def test_add(self):
        assert (fe(1, M7) + fe(2, M7)).value == 3

    def test_sub(self):
        assert (fe(1, M7) - fe(2, M7)).value == 6

    def test_mul(self):
        assert (fe(3, M7) * fe(4, M7)).value == 5

    def test_div(self):
        assert (fe(1, M7) / fe(3, M7)).value == 5

    def test_inverse(self):
        assert fe(3, M7).inverse().value == 5

    def test_pow(self):
        assert fe(3, M7).pow(3).value == 6

    def test_zero_one(self):
        assert FieldElement.zero(M7).value == 0
        assert FieldElement.one(M7).value == 1

    def test_negation(self):
        assert (-fe(3, M7)).value == 4

    def test_random_in_range(self):
        for _ in range(100):
            assert FieldElement.random(M7).value < M7

    def test_wraparound(self):
        assert (fe(10, M7) + fe(12, M7)).value == 1

    def test_equality(self):
        assert fe(3, M7) == fe(10, M7)

    def test_pow_zero(self):
        assert fe(3, M7).pow(0).value == 1

    def test_pow_one(self):
        assert fe(3, M7).pow(1).value == 3

    def test_inverse_multiplication(self):
        a = fe(3, M7)
        assert (a * a.inverse()).value == 1

    def test_to_bytes_big_endian(self):
        # frozen encoding: 8-byte BE (element.rs:59-61)
        assert fe(3, M7).to_bytes() == b"\x00" * 7 + b"\x03"
        assert FieldElement(DEFAULT_MODULUS - 1, DEFAULT_MODULUS).to_bytes() == (
            (DEFAULT_MODULUS - 1).to_bytes(8, "big")
        )

    def test_from_bytes_roundtrip(self):
        a = fe(1234567, DEFAULT_MODULUS)
        assert FieldElement.from_bytes(a.to_bytes(), DEFAULT_MODULUS) == a

    def test_inverse_zero_raises(self):
        with pytest.raises(ZeroDivisionError):
            fe(0, M7).inverse()

    def test_negative_int_construction(self):
        # From<i128> semantics (element.rs:138-147)
        assert fe(-1, M7).value == 6


# ---------------------------------------------------------------------------
# uint32 limb product
# ---------------------------------------------------------------------------
def test_mulhilo_exhaustive_edges():
    edge = np.array(
        [0, 1, 2, 0xFFFF, 0x10000, 0x10001, 0x7FFFFFFF, 0x80000000,
         0xFFFFFFFE, 0xFFFFFFFF, 0xDEADBEEF, 0x12345678],
        dtype=np.uint32,
    )
    a = np.repeat(edge, len(edge))
    b = np.tile(edge, len(edge))
    hi, lo = _mulhilo32(jnp.asarray(a), jnp.asarray(b))
    full = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi).astype(object), full >> 32)
    np.testing.assert_array_equal(np.asarray(lo).astype(object), full & 0xFFFFFFFF)


def test_mulhilo_random():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    hi, lo = _mulhilo32(jnp.asarray(a), jnp.asarray(b))
    full = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi).astype(object), full >> 32)
    np.testing.assert_array_equal(np.asarray(lo).astype(object), full & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# batched device ops vs Python-int oracle
# ---------------------------------------------------------------------------
def _rand_pair(p, n=2048, seed=1):
    rng = np.random.default_rng(seed + p % 1000)
    a = (rng.integers(0, 1 << 62, size=n, dtype=np.uint64) % p).astype(np.uint32)
    b = (rng.integers(0, 1 << 62, size=n, dtype=np.uint64) % p).astype(np.uint32)
    # force edge values into the batch
    for i, v in enumerate([0, 1, p - 1, p - 2 if p > 2 else 0]):
        a[i] = v
        b[-1 - i] = v
    return a, b


@pytest.mark.parametrize("p", MODULI)
def test_add_sub_neg(p):
    f = Fp.get(p)
    a, b = _rand_pair(p)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    oa, ob = a.astype(object), b.astype(object)
    np.testing.assert_array_equal(np.asarray(f.jit_add(ja, jb)).astype(object), (oa + ob) % p)
    np.testing.assert_array_equal(np.asarray(f.jit_sub(ja, jb)).astype(object), (oa - ob) % p)
    np.testing.assert_array_equal(np.asarray(f.jit_neg(ja)).astype(object), (-oa) % p)


@pytest.mark.parametrize("p", MODULI)
def test_mul(p):
    f = Fp.get(p)
    a, b = _rand_pair(p)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    got = np.asarray(f.jit_mul(ja, jb)).astype(object)
    np.testing.assert_array_equal(got, (a.astype(object) * b.astype(object)) % p)


@pytest.mark.parametrize("p", MODULI)
def test_mont_roundtrip(p):
    f = Fp.get(p)
    a, _ = _rand_pair(p)
    ja = jnp.asarray(a)
    np.testing.assert_array_equal(np.asarray(f.jit_from_mont(f.jit_to_mont(ja))), a)


@pytest.mark.parametrize("p", [7, TEST_MODULUS, DEFAULT_MODULUS])
def test_pow_static_and_inv(p):
    f = Fp.get(p)
    a, _ = _rand_pair(p, n=512)
    ja = jnp.asarray(a)
    for e in [0, 1, 2, 3, 10, p - 2]:
        got = np.asarray(f.jit_pow_static(ja, e)).astype(object)
        want = np.array([pow(int(x), e, p) for x in a], dtype=object)
        np.testing.assert_array_equal(got, want)
    # inverse: a * inv(a) == 1 for nonzero a
    nz = a.copy()
    nz[nz == 0] = 1
    jnz = jnp.asarray(nz)
    np.testing.assert_array_equal(np.asarray(f.jit_mul(jnz, f.jit_inv(jnz))), np.ones_like(nz))


@pytest.mark.parametrize("p", [TEST_MODULUS, DEFAULT_MODULUS])
def test_pow_traced(p):
    f = Fp.get(p)
    rng = np.random.default_rng(5)
    a = (rng.integers(0, p, size=256, dtype=np.uint64)).astype(np.uint32)
    e = rng.integers(0, 1 << 31, size=256, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(f.jit_pow(jnp.asarray(a), jnp.asarray(e))).astype(object)
    want = np.array([pow(int(x), int(k), p) for x, k in zip(a, e)], dtype=object)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [TEST_MODULUS, DEFAULT_MODULUS])
def test_powers_series(p):
    f = Fp.get(p)
    g = 5
    for count in [1, 2, 3, 16, 100, 128]:
        got = np.asarray(f.jit_powers(g, count)).astype(object)
        want = np.array([pow(g, i, p) for i in range(count)], dtype=object)
        np.testing.assert_array_equal(got, want)


def test_geometric_table():
    p = TEST_MODULUS
    f = Fp.get(p)
    ratios = np.array([1, 2, 3, 5, 96], dtype=np.uint32)
    got = np.asarray(f.jit_geometric_table(jnp.asarray(ratios), 12)).astype(object)
    want = np.array([[pow(int(r), j, p) for j in range(12)] for r in ratios], dtype=object)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [TEST_MODULUS, DEFAULT_MODULUS, 4294967291])
def test_sum_mod(p):
    f = Fp.get(p)
    rng = np.random.default_rng(9)
    a = (rng.integers(0, p, size=1001, dtype=np.uint64)).astype(np.uint32)
    got = int(np.asarray(f.jit_sum(jnp.asarray(a))))
    assert got == int(a.astype(object).sum()) % p


def test_coset_domain():
    p = TEST_MODULUS
    f = Fp.get(p)
    omega = f.two_adic_root(16, 5)
    dom = np.asarray(f.jit_coset_domain(3, omega, 16)).astype(object)
    want = np.array([3 * pow(omega, i, p) % p for i in range(16)], dtype=object)
    np.testing.assert_array_equal(dom, want)


def test_two_adic_root_orders():
    f = Fp.get(DEFAULT_MODULUS)
    for k in [1, 2, 10, 20, 30]:
        w = f.two_adic_root(1 << k, 5)
        assert pow(w, 1 << k, DEFAULT_MODULUS) == 1
        if k >= 1:
            assert pow(w, 1 << (k - 1), DEFAULT_MODULUS) != 1


def test_fp_rejects_bad_moduli():
    with pytest.raises(ValueError):
        Fp(8)
    with pytest.raises(ValueError):
        Fp(2)
    with pytest.raises(ValueError):
        Fp(1 << 33)
