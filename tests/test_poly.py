"""Polynomial algebra tests — mirrors the reference's ops.rs test battery
(reference: src/polynomial/ops.rs:551-1089) over GF(7), plus randomized
identities and the interpolation module's tests
(src/polynomial/interpolation.rs:154-374).
"""

import numpy as np
import pytest

from stark_tpu.poly import (
    Polynomial,
    poly,
    gen_polynomial_from_roots,
    gen_lagrange_polynomials,
    interpolate_lagrange,
)
from stark_tpu.fields import fe
from stark_tpu.config import TEST_MODULUS

M = 7


class TestConstruction:
    def test_trim_trailing_zeros(self):
        assert poly([1, 2, 0, 0], M).coeffs == [1, 2]

    def test_zero_poly_degree(self):
        assert Polynomial.zero(M).degree == -1
        assert poly([0, 0], M).degree == -1

    def test_degree(self):
        assert poly([1, 2, 3], M).degree == 2

    def test_negative_coeffs(self):
        assert poly([-1, -8], M).coeffs == [6, 6]

    def test_from_iter(self):
        assert Polynomial.from_iter(iter([1, 2]), M).coeffs == [1, 2]


class TestArithmetic:
    def test_add(self):
        assert (poly([1, 2], M) + poly([3, 4, 5], M)).coeffs == [4, 6, 5]

    def test_add_cancels(self):
        assert (poly([1, 2], M) + poly([6, 5], M)).is_zero()

    def test_sub(self):
        assert (poly([1, 2], M) - poly([3, 4], M)).coeffs == [5, 5]

    def test_neg(self):
        assert (-poly([1, 2], M)).coeffs == [6, 5]

    def test_mul(self):
        # (1+2x)(3+4x) = 3 + 10x + 8x^2 = 3 + 3x + x^2 mod 7 (ops.rs:625-631)
        assert (poly([1, 2], M) * poly([3, 4], M)).coeffs == [3, 3, 1]

    def test_mul_zero(self):
        assert (poly([1, 2], M) * Polynomial.zero(M)).is_zero()

    def test_scalar_mul(self):
        assert (poly([1, 2], M) * 3).coeffs == [3, 6]
        assert (3 * poly([1, 2], M)).coeffs == [3, 6]

    def test_scalar_via_field_element(self):
        assert (poly([1, 2], M) * fe(3, M)).coeffs == [3, 6]

    def test_div_rem_reconstruction(self):
        # q*b + r == a on random inputs (ops.rs:1043-1067)
        rng = np.random.default_rng(2)
        for _ in range(20):
            a = Polynomial.random(rng.integers(0, 12), M, rng)
            b = Polynomial.random(rng.integers(0, 8), M, rng)
            if b.is_zero():
                continue
            q, r = divmod(a, b)
            assert q * b + r == a
            assert r.degree < b.degree or r.is_zero()

    def test_div_by_zero_raises(self):
        with pytest.raises(ZeroDivisionError):
            divmod(poly([1], M), Polynomial.zero(M))

    def test_exact_div(self):
        a = poly([1, 2, 1], M)  # (1+x)^2
        b = poly([1, 1], M)
        assert a / b == b

    def test_nonexact_div_raises(self):
        # ops.rs:412-421 panics on nonzero remainder; we raise
        with pytest.raises(ValueError):
            poly([1, 1, 1], M) / poly([1, 1], M)

    def test_mod(self):
        assert (poly([1, 1, 1], M) % poly([1, 1], M)).coeffs == [1]

    def test_pow(self):
        assert (poly([1, 1], M) ** 2).coeffs == [1, 2, 1]
        assert (poly([1, 1], M) ** 0).coeffs == [1]

    def test_ntt_mul_path_matches_schoolbook(self):
        # large enough to trip the NTT path over the 2-adic test modulus
        p = TEST_MODULUS
        rng = np.random.default_rng(3)
        a = Polynomial.random(90, p, rng)
        b = Polynomial.random(80, p, rng)
        got = a * b
        # force schoolbook
        import stark_tpu.poly.ops as ops_mod

        thresh = ops_mod._NTT_MUL_THRESHOLD
        ops_mod._NTT_MUL_THRESHOLD = 10**9
        try:
            want = a * b
        finally:
            ops_mod._NTT_MUL_THRESHOLD = thresh
        assert got == want


class TestEvalCompose:
    def test_evaluate_horner(self):
        # 1 + 2x + 3x^2 at x=2 -> 17 mod 7 = 3
        assert poly([1, 2, 3], M).evaluate(2).value == 3

    def test_evaluate_empty(self):
        assert Polynomial.zero(M).evaluate(5).value == 0

    def test_evaluate_batch(self):
        p = poly([1, 2, 3], TEST_MODULUS)
        xs = np.arange(10)
        got = p.evaluate_batch(xs)
        want = [(1 + 2 * x + 3 * x * x) % TEST_MODULUS for x in xs]
        assert got.tolist() == want

    def test_compose(self):
        # p(x)=x^2, q(x)=x+1 -> p(q) = x^2+2x+1
        assert poly([0, 0, 1], M).compose(poly([1, 1], M)).coeffs == [1, 2, 1]

    def test_callable_sugar(self):
        # nightly Fn impls (ops.rs:490-530): p(x) evaluates, p(q) composes
        p = poly([0, 0, 1], M)
        assert p(3).value == 2
        assert p(poly([1, 1], M)).coeffs == [1, 2, 1]


class TestInterpolation:
    def test_roots_product(self):
        # (x-1)(x-2) = 2 - 3x + x^2 mod 7 (interpolation.rs:154+)
        z = gen_polynomial_from_roots([1, 2], M)
        assert z.coeffs == [2, 4, 1]

    def test_lagrange_kronecker_delta(self):
        xs = [1, 2, 3, 4]
        basis = gen_lagrange_polynomials(xs, M)
        for i, li in enumerate(basis):
            for j, xj in enumerate(xs):
                assert li.evaluate(xj).value == (1 if i == j else 0)

    def test_interpolate_fixed(self):
        xs, ys = [1, 2, 3], [4, 5, 6]
        p = interpolate_lagrange(xs, ys, M)
        for x, y in zip(xs, ys):
            assert p.evaluate(x).value == y

    def test_interpolate_roundtrip_random(self):
        # the randomized round-trip the reference left commented out
        # (interpolation.rs:223-256)
        p = TEST_MODULUS
        rng = np.random.default_rng(4)
        xs = rng.permutation(p)[:20].tolist()
        ys = rng.integers(0, p, size=20).tolist()
        f = interpolate_lagrange(xs, ys, p)
        assert f.degree < 20
        for x, y in zip(xs, ys):
            assert f.evaluate(x).value == y

    def test_duplicate_points_raise(self):
        with pytest.raises(ValueError):
            gen_lagrange_polynomials([1, 1], M)

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            interpolate_lagrange([1, 2], [1], M)
