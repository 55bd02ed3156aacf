"""Pallas fused four-step NTT — the speed-of-light single-chip path.

The XLA Stockham plan (stark_tpu.ntt.ntt) executes log2(n) separate
butterfly stages, each a full HBM round trip: ~2*log2(n) passes over the
data.  This kernel restructures the transform as the four-step algorithm
n = n1 * n2 (same decomposition as the distributed NTT, dist/ntt.py) and
fuses each sub-transform's stages entirely in VMEM:

  step 1 (pallas): for each 128-column block of A = x.reshape(n1, n2),
          run all log2(n1) Stockham stages along axis 0 in VMEM, then
          multiply by the twiddle block T[k1, j2] = w^(j2*k1)
  step t (XLA):    one u32 transpose (n1, n2) -> (n2, n1)
  step 2 (pallas): for each 128-column block of C^T, run all log2(n2)
          stages along axis 0; output IS X.reshape(n2, n1) row-major —
          no third transpose (derivation in dist/ntt.py docstring)

HBM traffic: ~6 passes + one twiddle-table read, independent of log n —
vs ~2 log2(n) for the staged XLA plan.  All math is the same uint32
Montgomery arithmetic (fields/fp.py); lanes (last dim, 128) carry batch,
transforms always run along the sublane axis so no lane-crossing
reshapes occur.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.reference_ntt import ntt_available, root_of_unity

_U32 = jnp.uint32
LANES = 128


def _stage_twiddles_mont(fp: Fp, length: int, root: int):
    """Expanded per-stage twiddle patterns, mont form, concatenated as one
    ((length/2) * log2(length), 1) array.  Stage with half-length lh and
    inner size m stores its (lh, m) broadcast pattern flattened (the same
    twiddle repeated m times) — so the kernel only ever broadcasts across
    LANES (Mosaic rejects combined sublane+lane broadcasts)."""
    p = fp.p

    def build():
        parts = []
        l, m = length, 1
        while l > 1:
            lh = l // 2
            wl = pow(root, length // l, p)
            tw = fp.to_mont(fp.powers(wl, lh))
            parts.append(jnp.repeat(tw, m))  # (lh*m,) == (length/2,)
            l, m = lh, 2 * m
        if not parts:
            parts = [jnp.zeros((1,), _U32)]
        return jnp.concatenate(parts)[:, None]

    return jax.jit(build)()  # one dispatch (tunnel round trips are ~0.5s)


def _stages_axis0(fp: Fp, xm, tws_ref, length: int):
    """All butterfly stages along axis 0 of (length, LANES), lanes batch.
    xm Montgomery-form; twiddles from tws_ref (see _stage_twiddles_mont)."""
    l, m = length, 1
    off = 0
    half = length // 2
    while l > 1:
        lh = l // 2
        t = tws_ref[off : off + half].reshape(lh, m, 1)  # lane-broadcast only
        v = xm.reshape(l, m, LANES)
        a, b = v[:lh], v[lh:]
        top = fp.add(a, b)
        bot = fp.mont_mul(t, fp.sub(a, b))
        xm = jnp.stack([top, bot], axis=1).reshape(lh * 2 * m, LANES)
        off += half
        l, m = lh, 2 * m
    return xm


@functools.lru_cache(maxsize=None)
def _plan(p: int, n: int, inverse: bool, interpret: bool):
    return _PallasNTT(p, n, inverse, interpret)


class _PallasNTT:
    def __init__(self, p: int, n: int, inverse: bool, interpret: bool):
        if not ntt_available(p, n):
            raise ValueError(f"GF({p}) has no order-{n} subgroup")
        log_n = n.bit_length() - 1
        log_n1 = (log_n + 1) // 2
        self.n1 = 1 << log_n1
        self.n2 = n >> log_n1
        if self.n2 < LANES or self.n1 < LANES:
            raise ValueError(
                f"pallas NTT needs n >= 2^14 (got 2^{log_n}); use the XLA plan"
            )
        self.p = p
        self.n = n
        self.inverse = inverse
        self.fp = fp = Fp.get(p)
        w = root_of_unity(p, n)
        if inverse:
            w = pow(w, p - 2, p)
        # sub-transform roots (see dist/ntt.py): step1 root w^n2 (order n1),
        # step2 root w^n1 (order n2)
        self.tws1 = _stage_twiddles_mont(fp, self.n1, pow(w, self.n2, p))
        self.tws2 = _stage_twiddles_mont(fp, self.n2, pow(w, self.n1, p))
        # big twiddle table T[k1, j2] = w^(j2*k1), mont form, (n1, n2)
        ratios = fp.jit_powers(w, self.n1)  # w^k1
        self.table = fp.jit_to_mont(fp.jit_geometric_table(ratios, self.n2))
        self.ninv_mont = pow(n, p - 2, p) * fp.r % p  # python int -> kernel literal
        self.interpret = interpret
        self._jit = jax.jit(self._run)

    # -- kernels ----------------------------------------------------------
    def _step1_kernel(self, x_ref, t_ref, tws_ref, o_ref):
        fp = self.fp
        xm = fp.to_mont(x_ref[:])                       # (n1, LANES)
        xm = _stages_axis0(fp, xm, tws_ref, self.n1)    # B[k1, j2]
        o_ref[:] = fp.mont_mul(xm, t_ref[:])            # * w^(j2 k1)

    def _step2_kernel(self, x_ref, tws_ref, o_ref):
        fp = self.fp
        xm = _stages_axis0(fp, x_ref[:], tws_ref, self.n2)
        if self.inverse:
            xm = fp.mont_mul(xm, _U32(self.ninv_mont))
        o_ref[:] = fp.from_mont(xm)

    def _run(self, x, table, tws1, tws2):
        n1, n2 = self.n1, self.n2
        a = x.reshape(n1, n2)
        c = pl.pallas_call(
            self._step1_kernel,
            out_shape=jax.ShapeDtypeStruct((n1, n2), _U32),
            grid=(n2 // LANES,),
            in_specs=[
                pl.BlockSpec((n1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((tws1.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n1, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(a, table, tws1)
        ct = c.T  # XLA transpose (n2, n1)
        d_t = pl.pallas_call(
            self._step2_kernel,
            out_shape=jax.ShapeDtypeStruct((n2, n1), _U32),
            grid=(n1 // LANES,),
            in_specs=[
                pl.BlockSpec((n2, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((tws2.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n2, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(ct, tws2)
        return d_t.reshape(self.n)  # == X in natural order

    def __call__(self, x):
        return self._jit(x, self.table, self.tws1, self.tws2)


def pallas_ntt(x, p: int, interpret: bool = False):
    """Forward NTT via fused Pallas kernels (natural order, identical
    output to stark_tpu.ntt.ntt)."""
    return _plan(p, int(x.shape[-1]), False, interpret)(x)


def pallas_intt(x, p: int, interpret: bool = False):
    return _plan(p, int(x.shape[-1]), True, interpret)(x)
