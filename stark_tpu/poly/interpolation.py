"""Lagrange interpolation — host oracle.

Mirrors the reference's interpolation module
(reference: src/polynomial/interpolation.rs:9-152): Z(x) = prod (x - x_j)
computed once, each basis polynomial L_i = Z / (x - x_i) * denom_i^-1,
then sum y_i * L_i.  The reference's only parallelism is a rayon par-iter
over i (interpolation.rs:80-115); here the per-i work is a numpy-vectorized
synthetic division, and production interpolation uses the INTT
(stark_tpu.ntt) — this module is the small-n oracle (SURVEY §2 row
"Interpolation").
"""

from __future__ import annotations

import numpy as np

from stark_tpu.poly.ops import Polynomial


def gen_polynomial_from_roots(roots, modulus: int) -> Polynomial:
    """prod (x - r) (interpolation.rs:9-23), built by sequential monomial
    products but with O(n) numpy updates per step."""
    p = modulus
    coeffs = [1]
    for r in roots:
        rv = int(r) % p
        # multiply by (x - rv): new[i] = old[i-1] - rv*old[i]
        coeffs = [(-rv * coeffs[0]) % p] + [
            (coeffs[i] - rv * coeffs[i + 1]) % p for i in range(len(coeffs) - 1)
        ] + [1]
        coeffs[-1] = 1
    return Polynomial(coeffs, p)


def _synthetic_div(z: list[int], xi: int, p: int) -> list[int]:
    """Z(x) / (x - xi), exact, O(n) (replaces long division at
    interpolation.rs:103)."""
    n = len(z) - 1
    out = [0] * n
    acc = 0
    for k in range(n - 1, -1, -1):
        acc = (z[k + 1] + acc * xi) % p
        out[k] = acc
    return out


def gen_lagrange_polynomials(xs, modulus: int) -> list[Polynomial]:
    """All Lagrange basis polynomials (interpolation.rs:46-115)."""
    p = modulus
    xv = [int(x) % p for x in xs]
    if len(set(xv)) != len(xv):
        raise ValueError("interpolation points must be distinct")
    z = gen_polynomial_from_roots(xv, p).coeffs
    out = []
    for i, xi in enumerate(xv):
        denom = 1
        for j, xj in enumerate(xv):
            if i != j:
                denom = denom * (xi - xj) % p
        dinv = pow(denom, p - 2, p)
        li = _synthetic_div(z, xi, p)
        out.append(Polynomial([c * dinv % p for c in li], p))
    return out


def interpolate_lagrange(xs, ys, modulus: int) -> Polynomial:
    """sum y_i * L_i (interpolation.rs:121-152)."""
    if len(xs) != len(ys):
        raise ValueError("xs and ys must have equal length")
    p = modulus
    basis = gen_lagrange_polynomials(xs, p)
    n = len(xs)
    acc = [0] * n
    for yi, li in zip(ys, basis):
        yv = int(yi) % p
        for k, c in enumerate(li.coeffs):
            acc[k] = (acc[k] + yv * c) % p
    return Polynomial(acc, p)
