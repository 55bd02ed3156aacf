"""Fused device pipeline — the prover's "forward step" as one jittable
function (trace in, commitment digests + first fold out).

This is the unit the compile-check and perf harnesses drive: everything
between two Fiat-Shamir interactions fused into a single XLA program
(trace interpolation INTT, coset NTT, Merkle levels, composition, first
FRI fold), with challenges passed in as scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stark_tpu.config import ProverConfig
from stark_tpu.fields.fp import Fp
from stark_tpu.fri.commit import _fold_jit, _inv_domain
from stark_tpu.merkle.tree import _build_jit
from stark_tpu.ntt.ntt import get_plan
from stark_tpu.ntt.reference_ntt import root_of_unity
from stark_tpu.stark.air import _FibContext
from stark_tpu.stark.trace import _trace_poly_jit

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def build_prove_core(cfg: ProverConfig):
    """Returns fn(trace, alphas(3,), beta, a0, a_last) ->
    (trace_root_digest(1,8), cp_evals(M,), folded(M/2,)) — jittable,
    single device."""
    cfg.validate()
    p = cfg.modulus
    f = Fp.get(p)
    N = cfg.trace_domain_size
    M = cfg.eval_domain_size
    h = cfg.offset
    ctx = _FibContext(cfg)
    trace_poly = _trace_poly_jit(p, N)
    plan_f = get_plan(p, M, False)
    merkle = _build_jit(M)
    fold = _fold_jit(p, M)
    inv_dom = _inv_domain(p, M, h)
    off_pows = f.jit_powers(h, N)

    def core(trace, alphas, beta, a0, a_last):
        coeffs = trace_poly(trace)
        shifted = f.mul(coeffs, off_pows)
        padded = jnp.zeros((M,), dtype=_U32).at[:N].set(shifted)
        f_evals = plan_f(padded)
        levels = merkle(f_evals)
        cp = ctx._compose(f_evals, alphas, a0, a_last)
        folded = fold(cp, beta, inv_dom)
        return levels[-1], cp, folded

    return core
