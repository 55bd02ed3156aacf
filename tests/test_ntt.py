"""NTT layer tests: host oracle vs naive DFT, device NTT vs host oracle,
LDE/coset round trips.  (The reference has no NTT — Readme.md:2 TODO —
so behavior is frozen here: natural-order radix-2 with the canonical root
from the smallest field generator.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stark_tpu.config import DEFAULT_MODULUS, TEST_MODULUS
from stark_tpu.fields import Fp
from stark_tpu.ntt import (
    ntt,
    intt,
    lde,
    coset_evaluate,
    coset_interpolate,
    ntt_host,
    naive_dft,
    root_of_unity,
    ntt_available,
)
from stark_tpu.poly import Polynomial


def _rand(p, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, p, size=n, dtype=np.uint64)).astype(np.uint32)


@pytest.mark.parametrize("n", [1, 2, 4, 16, 64])
def test_host_ntt_vs_naive(n):
    p = TEST_MODULUS if n <= 32 else DEFAULT_MODULUS
    x = _rand(p, n, seed=n)
    assert ntt_host(x, p).tolist() == naive_dft(x, p)


@pytest.mark.parametrize("p", [TEST_MODULUS, DEFAULT_MODULUS])
@pytest.mark.parametrize("n", [2, 8, 32])
def test_device_ntt_vs_host(p, n):
    if not ntt_available(p, n):
        pytest.skip("field lacks 2-adicity")
    x = _rand(p, n, seed=n)
    got = np.asarray(ntt(jnp.asarray(x), p))
    want = ntt_host(x, p)
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_device_ntt_large_roundtrip():
    p = DEFAULT_MODULUS
    n = 1 << 12
    x = _rand(p, n, seed=9)
    jx = jnp.asarray(x)
    back = np.asarray(intt(ntt(jx, p), p))
    np.testing.assert_array_equal(back, x)


def test_device_matches_host_large():
    p = DEFAULT_MODULUS
    n = 1 << 10
    x = _rand(p, n, seed=11)
    np.testing.assert_array_equal(
        np.asarray(ntt(jnp.asarray(x), p)), ntt_host(x, p).astype(np.uint32)
    )


def test_ntt_is_evaluation_on_subgroup():
    """X[k] must equal P(w^k) where P has the inputs as coefficients."""
    p = TEST_MODULUS
    n = 16
    coeffs = _rand(p, n, seed=3)
    w = root_of_unity(p, n)
    got = np.asarray(ntt(jnp.asarray(coeffs), p))
    poly = Polynomial(coeffs.tolist(), p)
    want = [poly.evaluate(pow(w, k, p)).value for k in range(n)]
    assert got.tolist() == want


def test_lde_agrees_with_polynomial_eval():
    """LDE output must be the trace polynomial evaluated on the big coset."""
    p = TEST_MODULUS
    n, blowup, offset = 8, 4, 5
    values = _rand(p, n, seed=7)
    out = np.asarray(lde(jnp.asarray(values), p, blowup, offset))

    # oracle: interpolate on subgroup, evaluate on coset
    w_small = root_of_unity(p, n)
    xs = [pow(w_small, i, p) for i in range(n)]
    f = Polynomial.interpolate(xs, values.tolist(), p)
    big = n * blowup
    w_big = root_of_unity(p, big)
    want = [f.evaluate(offset * pow(w_big, i, p) % p).value for i in range(big)]
    assert out.tolist() == want
    # consistency: domain point offset*W^(blowup*i) = offset... no — but the
    # subgroup points w_small^i = W^(blowup*i), so every blowup-th output of
    # an offset=1 LDE reproduces the input
    out1 = np.asarray(lde(jnp.asarray(values), p, blowup, 1))
    np.testing.assert_array_equal(out1[::blowup], values)


def test_coset_evaluate_interpolate_roundtrip():
    p = DEFAULT_MODULUS
    n = 256
    offset = 5
    coeffs = _rand(p, n, seed=13)
    evals = coset_evaluate(jnp.asarray(coeffs), p, n, offset)
    back = np.asarray(coset_interpolate(evals, p, offset))
    np.testing.assert_array_equal(back, coeffs)


def test_bad_sizes_raise():
    p = TEST_MODULUS
    with pytest.raises(ValueError):
        ntt(jnp.zeros(12, dtype=jnp.uint32), p)  # not a power of 2
    with pytest.raises(ValueError):
        ntt(jnp.zeros(64, dtype=jnp.uint32), p)  # exceeds 2-adicity (2^5)
