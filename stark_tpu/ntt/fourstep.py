"""Pure-XLA four-step NTT — layout-optimal large transforms.

The 1-D Stockham plan's early stages interleave at granularity m = 1, 2,
4... — strided writes far below the TPU's (8, 128) tile, leaving the
kernel at ~30% of HBM bandwidth.  The four-step decomposition
n = n1 * n2 runs every butterfly stage along axis 0 of an (L, C) matrix
with C >= sqrt(n) lanes, so every read/write is wide and tile-aligned:

    A = x.reshape(n1, n2)
    B = NTT_n1 along axis 0          (lanes = n2 columns)
    C = B * T,  T[k1, j2] = w^(j2*k1)
    D = NTT_n2 along axis 0 of C^T   (one XLA transpose; lanes = n1)
    X = D^T flattened == natural order (derivation in dist/ntt.py)

Same twiddle conventions as the Pallas kernel (pallas_ntt) and the
distributed plan; bit-identical output to the 1-D plan.  Used as the
default plan for large n (ntt.get_plan dispatches here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.reference_ntt import ntt_available, root_of_unity

_U32 = jnp.uint32

# below this size the 1-D plan wins (fewer reshapes, no transpose)
FOURSTEP_MIN = 1 << 14

# Fuse radix-2 stage pairs into radix-4 only at/above this total element
# count (length x batch): measured v5e crossover (2^24: 12.9 -> 8.4 ms;
# 2^22 and below: no win, ~3x XLA compile time).
RADIX4_MIN_ELEMS = 1 << 24


def stages_axis0(fp: Fp, xm, twiddles, length: int):
    """All Stockham butterfly stages along axis -2 of (..., length, C),
    Montgomery domain.  `twiddles`: per-stage mont arrays [(lh,), ...]
    (or [(2, lh), ...] for two-limb fields, whose limb plane leads and
    rides through the batch dims, fields/fp64.py).

    Consecutive stage pairs run as ONE radix-4 butterfly (SURVEY §7.2.3):
    XLA materializes each stage's interleave in HBM, so fusing two
    radix-2 stages into one pass halves the dominant cost (per-stage HBM
    traffic) at the same multiply count.  Output is bit-identical to the
    radix-2 sequence (the radix-4 form below is the exact algebraic
    composition of two radix-2 stages; twiddle identities w_lh = w_l^2,
    J = w_l^(l/4)).  Gated on total work (RADIX4_MIN_ELEMS, see
    ntt.stockham_stages): below it radix-4 is a runtime wash that
    triples compile time."""
    batch = xm.shape[:-2]
    c = xm.shape[-1]
    total = 1
    for s in xm.shape:
        total *= int(s)
    r4 = total >= RADIX4_MIN_ELEMS
    wide = getattr(fp, "width", 1) > 1
    l, m = length, 1
    i = 0
    while i < len(twiddles):
        if r4 and l >= 4 and i + 1 < len(twiddles):
            t_l, t_lh = twiddles[i], twiddles[i + 1]
            i += 2
            lq = l // 4
            v = xm.reshape(batch + (l, m, c))
            q0 = v[..., :lq, :, :]
            q1 = v[..., lq : 2 * lq, :, :]
            q2 = v[..., 2 * lq : 3 * lq, :, :]
            q3 = v[..., 3 * lq :, :, :]
            s02, d02 = fp.add(q0, q2), fp.sub(q0, q2)
            s13, d13 = fp.add(q1, q3), fp.sub(q1, q3)
            jj = t_l[..., lq : lq + 1]  # J = w_l^(l/4) (mont)
            jd13 = fp.mont_mul(jj[..., :, None, None], d13)
            w1 = t_l[..., :lq, None, None]
            w2 = t_lh[..., :lq, None, None]
            w3 = fp.mont_mul(w1, w2)
            y00 = fp.add(s02, s13)
            y01 = fp.mont_mul(w1, fp.add(d02, jd13))
            y10 = fp.mont_mul(w2, fp.sub(s02, s13))
            y11 = fp.mont_mul(w3, fp.sub(d02, jd13))
            # (lq, i1, i0, m, c): i1 = second stage's interleave bit,
            # i0 = first stage's — identical layout to two radix-2 passes
            top = jnp.stack([y00, y01], axis=-3)
            bot = jnp.stack([y10, y11], axis=-3)
            xm = jnp.stack([top, bot], axis=-4).reshape(
                batch + (lq * 4 * m, c))
            l, m = lq, 4 * m
        else:
            t = twiddles[i]
            i += 1
            lh = l // 2
            v = xm.reshape(batch + (l, m, c))
            a, b = v[..., :lh, :, :], v[..., lh:, :, :]
            top = fp.add(a, b)
            bot = fp.mont_mul(t[..., :, None, None], fp.sub(a, b))
            xm = jnp.stack([top, bot], axis=-3).reshape(
                batch + (lh * 2 * m, c))
            l, m = lh, 2 * m
        if wide:
            # break the LLVM-visible op chain per stage (see fp64.py)
            xm = fp.chain_break(xm)
    return xm


@functools.lru_cache(maxsize=None)
def get_fourstep_plan(p: int, n: int, inverse: bool = False) -> "FourStepPlan":
    return FourStepPlan(p, n, inverse)


class FourStepPlan:
    """Drop-in for NTTPlan at large n (same input/output contract)."""

    def __init__(self, p: int, n: int, inverse: bool):
        if n & (n - 1) or n < 4:
            raise ValueError(f"four-step needs a power-of-two n >= 4, got {n}")
        if not ntt_available(p, n):
            raise ValueError(f"GF({p}) has no order-{n} subgroup")
        from stark_tpu.ntt.ntt import _stage_twiddles

        log_n = n.bit_length() - 1
        log_n1 = (log_n + 1) // 2
        self.n1 = 1 << log_n1
        self.n2 = n >> log_n1
        self.p = p
        self.n = n
        self.inverse = inverse
        self.fp = f = Fp.get(p)
        w = root_of_unity(p, n)
        if inverse:
            w = pow(w, p - 2, p)
        self._tws1 = _stage_twiddles(p, self.n1, pow(w, self.n2, p))
        self._tws2 = _stage_twiddles(p, self.n2, pow(w, self.n1, p))
        self._table = _twiddle_table(p, self.n1, self.n2, w)
        self._ninv_mont = f.const_mont(pow(n, p - 2, p))
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(self._transform, "ntt-fourstep",
                               (p, n, inverse))

    def _core(self, xm, table, tws1, tws2):
        """Montgomery-domain four-step on (..., n)."""
        f = self.fp
        batch = xm.shape[:-1]
        a = xm.reshape(batch + (self.n1, self.n2))
        b = stages_axis0(f, a, tws1, self.n1)
        c = f.mont_mul(b, table)
        ct = jnp.swapaxes(c, -1, -2)
        d_t = stages_axis0(f, ct, tws2, self.n2)
        return d_t.reshape(batch + (self.n,))

    def _transform(self, x, table, tws1, tws2):
        f = self.fp
        xm = f.to_mont(x)
        xm = self._core(xm, table, tws1, tws2)
        if self.inverse:
            xm = f.mont_mul(xm, self._ninv_mont)
        return f.from_mont(xm)

    def __call__(self, x) -> jax.Array:
        return self._jit(x, self._table, self._tws1, self._tws2)

    def mont_stages(self, xm):
        """Montgomery-domain entry (fuses into larger pipelines)."""
        out = self._core(xm, self._table, self._tws1, self._tws2)
        if self.inverse:
            out = self.fp.mont_mul(out, self._ninv_mont)
        return out


@functools.lru_cache(maxsize=None)
def _twiddle_table(p: int, n1: int, n2: int, w: int):
    """T[k1, j2] = w^(j2*k1), Montgomery form — host-built constants
    (fp.host_powers / fp64.host_powers; zero XLA compile)."""
    f = Fp.get(p)
    return jnp.asarray(
        f.host_geometric_table(f.host_powers(w, n1), n2, mont=True))
