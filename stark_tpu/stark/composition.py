"""Composition polynomial — fills the reference's empty
``src/composition/`` stub (0 bytes, SURVEY §2).

The generic machinery now lives in stark_tpu.stark.air (per-AIR contexts
built on the shared table helpers); this module keeps the original
fib-square API surface used elsewhere:

    CompositionContext(cfg) / get_context(cfg) — STARK-101's
    CP = alpha0*(f-a0)/(x-1) + alpha1*(f-a_last)/(x-g^{T-1})
       + alpha2*(f(g^2 x)-f(gx)^2-f(x)^2) * cubic/(x^N-1)
"""

from __future__ import annotations

import functools

from stark_tpu.config import ProverConfig
from stark_tpu.stark.air import _FibContext


class CompositionContext(_FibContext):
    """Fibonacci-square composition context (back-compat alias)."""


@functools.lru_cache(maxsize=None)
def get_context(cfg: ProverConfig) -> CompositionContext:
    return CompositionContext(cfg)
