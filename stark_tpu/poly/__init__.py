from stark_tpu.poly.ops import Polynomial, poly
from stark_tpu.poly.interpolation import (
    gen_polynomial_from_roots,
    gen_lagrange_polynomials,
    interpolate_lagrange,
)

__all__ = [
    "Polynomial",
    "poly",
    "gen_polynomial_from_roots",
    "gen_lagrange_polynomials",
    "interpolate_lagrange",
]
