"""Pallas TPU kernels for field arithmetic.

The uint32 Montgomery math in stark_tpu.fields.fp is pure jnp and runs
unchanged inside Pallas kernels (no 64-bit types anywhere).  These
kernels exist for the fusion wins XLA cannot make on its own — keeping
values in VMEM across many field ops (NTT stages, hash rounds) instead of
one HBM round trip per elementwise op.

``mont_mul_pallas`` / ``mul_pallas`` are the validation kernels (same
math as Fp, one VMEM block per grid step); the fused NTT kernels live in
stark_tpu.ntt.pallas_ntt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.fields.fp import Fp

_U32 = jnp.uint32

# rows x 128 lanes per VMEM block (uint32 min tile is (8, 128); use a tall
# block to amortize grid overhead)
_BLOCK_ROWS = 512
_LANES = 128


def _mul_kernel(fp: Fp, a_ref, b_ref, o_ref):
    o_ref[:] = fp.mul(a_ref[:], b_ref[:])


def _mont_mul_kernel(fp: Fp, a_ref, b_ref, o_ref):
    o_ref[:] = fp.mont_mul(a_ref[:], b_ref[:])


@functools.lru_cache(maxsize=None)
def _build(p: int, n: int, mont: bool, interpret: bool):
    fp = Fp.get(p)
    if n % (_BLOCK_ROWS * _LANES):
        # small inputs: single whole-array block
        def run(a, b):
            kern = _mont_mul_kernel if mont else _mul_kernel
            return pl.pallas_call(
                functools.partial(kern, fp),
                out_shape=jax.ShapeDtypeStruct(a.shape, _U32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    memory_space=pltpu.ANY if interpret else pltpu.VMEM
                ),
                interpret=interpret,
            )(a, b)

        return jax.jit(run)

    rows = n // _LANES
    grid = rows // _BLOCK_ROWS

    def run(a, b):
        kern = _mont_mul_kernel if mont else _mul_kernel
        a2 = a.reshape(rows, _LANES)
        b2 = b.reshape(rows, _LANES)
        out = pl.pallas_call(
            functools.partial(kern, fp),
            out_shape=jax.ShapeDtypeStruct((rows, _LANES), _U32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a2, b2)
        return out.reshape(n)

    return jax.jit(run)


def mul_pallas(a, b, p: int, interpret: bool = False):
    """Canonical (a*b) mod p via a Pallas VMEM kernel."""
    return _build(p, int(a.shape[-1]), False, interpret)(a, b)


def mont_mul_pallas(a, b, p: int, interpret: bool = False):
    """Montgomery-domain product via a Pallas VMEM kernel."""
    return _build(p, int(a.shape[-1]), True, interpret)(a, b)
