"""Composition polynomial — fills the reference's empty
``src/composition/`` stub (0 bytes, SURVEY §2) with STARK-101 semantics,
evaluated pointwise on the LDE coset as one fused device op.

CP = alpha0 * p0 + alpha1 * p1 + alpha2 * p2 with

    p0(x) = (f(x) - a_0)        / (x - g^0)
    p1(x) = (f(x) - a_{T-1})    / (x - g^{T-1})
    p2(x) = (f(g^2 x) - f(g x)^2 - f(x)^2)
            * (x - g^{N-3})(x - g^{N-2})(x - g^{N-1}) / (x^N - 1)

On the evaluation coset {h * W^j} (disjoint from the subgroup, so every
denominator is invertible), f(g x) is a cyclic shift: g = W^blowup, hence
f(g * h W^j) = LDE[(j + blowup) mod M].  All per-point constants —
1/(x - g^0), 1/(x - g^{T-1}), and the transition multiplier
cubic(x)/(x^N - 1) — are precomputed device tables (batched Fermat
inversion), cached per config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stark_tpu.config import ProverConfig
from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.reference_ntt import root_of_unity

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def get_context(cfg: ProverConfig) -> "CompositionContext":
    return CompositionContext(cfg)


class CompositionContext:
    """Precomputed tables + jitted pointwise composition for one config."""

    def __init__(self, cfg: ProverConfig):
        cfg.validate()
        p = cfg.modulus
        f = Fp.get(p)
        N = cfg.trace_domain_size
        M = cfg.eval_domain_size
        h = cfg.offset
        self.cfg = cfg
        self.fp = f
        self.g = root_of_unity(p, N)
        self.w = root_of_unity(p, M)

        domain = f.jit_coset_domain(h, self.w, M)

        @jax.jit
        def build(domain):
            one = _U32(1)
            inv0 = f.inv(f.sub(domain, one))
            inv1 = f.inv(f.sub(domain, _U32(pow(self.g, N - 2, p))))  # g^{T-1}
            # x^N: (h W^j)^N = h^N * (W^N)^j — period `blowup`, but the
            # plain pow is log(N) muls and stays fused
            xn = f.pow_static(domain, N)
            cubic = f.mul(
                f.mul(
                    f.sub(domain, _U32(pow(self.g, N - 3, p))),
                    f.sub(domain, _U32(pow(self.g, N - 2, p))),
                ),
                f.sub(domain, _U32(pow(self.g, N - 1, p))),
            )
            trans_mult = f.mul(cubic, f.inv(f.sub(xn, one)))
            return inv0, inv1, trans_mult

        self.domain = domain
        self.inv_b0, self.inv_b1, self.trans_mult = build(domain)
        self._compose_jit = jax.jit(self._compose)

    def _compose(self, lde, alphas, a0, a_last, inv_b0, inv_b1, trans_mult):
        f = self.fp
        b = self.cfg.blowup
        f_x = lde
        f_gx = jnp.roll(lde, -b)
        f_g2x = jnp.roll(lde, -2 * b)
        p0 = f.mul(f.sub(f_x, a0), inv_b0)
        p1 = f.mul(f.sub(f_x, a_last), inv_b1)
        num = f.sub(f.sub(f_g2x, f.mul(f_gx, f_gx)), f.mul(f_x, f_x))
        p2 = f.mul(num, trans_mult)
        return f.add(
            f.add(f.mul(alphas[0], p0), f.mul(alphas[1], p1)),
            f.mul(alphas[2], p2),
        )

    def compose(self, lde, alphas: tuple[int, int, int], a0: int, a_last: int):
        """CP evaluations (M,) from trace LDE evaluations (M,)."""
        al = jnp.asarray([a % self.cfg.modulus for a in alphas], dtype=_U32)
        return self._compose_jit(
            lde,
            al,
            _U32(a0 % self.cfg.modulus),
            _U32(a_last % self.cfg.modulus),
            self.inv_b0,
            self.inv_b1,
            self.trans_mult,
        )

    # -- host mirrors for the verifier ------------------------------------
    def cp_at(self, x: int, fx: int, fgx: int, fg2x: int,
              alphas: tuple[int, int, int], a0: int, a_last: int) -> int:
        """Host scalar CP(x) from opened trace values (verifier side)."""
        p = self.cfg.modulus
        N = self.cfg.trace_domain_size
        g = self.g
        p0 = (fx - a0) * pow((x - 1) % p, p - 2, p) % p
        p1 = (fx - a_last) * pow((x - pow(g, N - 2, p)) % p, p - 2, p) % p
        num = (fg2x - fgx * fgx - fx * fx) % p
        cubic = (
            (x - pow(g, N - 3, p)) * (x - pow(g, N - 2, p)) * (x - pow(g, N - 1, p))
        ) % p
        zn_inv = pow((pow(x, N, p) - 1) % p, p - 2, p)
        p2 = num * cubic * zn_inv % p
        return (alphas[0] * p0 + alphas[1] * p1 + alphas[2] * p2) % p
