"""Goldilocks field (p = 2^64 - 2^32 + 1) on uint32 limb-plane arrays.

SURVEY §7.1.1 promised a device path for moduli >= 2^32 (the reference's
own envelope stops at 2^32: its scalar ``pow`` overflows there,
reference: src/fields/element.rs:47).  This is that path, specialized to
the Goldilocks prime — the field every modern 64-bit STARK stack uses —
whose reduction needs no Montgomery machinery at all:

    phi  = 2^32,  p = phi^2 - phi + 1
    2^64 = phi - 1   (mod p)
    2^96 = -1        (mod p)

so a 128-bit product  hi64 * 2^64 + lo64  reduces as
``lo64 - hi(hi64) + lo(hi64) * (phi - 1)`` — three u32-pair operations.

Representation: an element array has shape ``(2,) + lanes`` with the limb
plane LEADING — ``a[0]`` the high u32 word, ``a[1]`` the low.  Leading-
plane layout means every elementwise op broadcasts exactly like the u32
field (``alpha[0]`` is a scalar against a ``(2, n)`` codeword's ``(n,)``
plane), and the Stockham NTT's batch-leading stages work unchanged.

The class mirrors :class:`stark_tpu.fields.fp.Fp`'s full surface.  The
"Montgomery domain" is the identity here (``to_mont``/``from_mont`` are
no-ops, ``one_mont == 1``) so Montgomery-generic callers (NTT stages,
FRI folds) run correctly without branching.  ``Fp.get`` dispatches to
this class for the Goldilocks modulus.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.fields.fp import _mulhilo32

_U32 = jnp.uint32

GOLDILOCKS = (1 << 64) - (1 << 32) + 1
_LOW_MASK = 0xFFFFFFFF  # 2^64 - p's low word... (2^64 - p == 2^32 - 1)


def _pair(hi, lo):
    return jnp.stack([hi, lo])


class Fp64Goldilocks:
    """Field context for the Goldilocks prime; duck-types Fp."""

    width = 2  # u32 limbs per element

    def __init__(self, modulus: int):
        if int(modulus) != GOLDILOCKS:
            raise ValueError(
                f"Fp64Goldilocks supports only p = 2^64 - 2^32 + 1, got "
                f"{modulus}; other >= 2^32 moduli have no device path yet")
        self.p = GOLDILOCKS
        # Montgomery-API compatibility: identity domain
        self.r = 1
        self.r2 = 1

    @staticmethod
    def get(modulus: int):
        from stark_tpu.fields.fp import Fp

        return Fp.get(modulus)

    # -- construction ------------------------------------------------------
    def const(self, value: int):
        """Canonical constant as a (2,) device array (broadcasts against
        any (2, ...) element array plane-by-plane)."""
        v = int(value) % self.p
        return jnp.asarray(
            np.array([v >> 32, v & 0xFFFFFFFF], dtype=np.uint32))

    def const_mont(self, value: int):
        return self.const(value)

    def array(self, values) -> jax.Array:
        flat = [int(v) % self.p
                for v in np.asarray(values, dtype=object).reshape(-1)]
        shape = np.shape(values)
        hi = np.asarray([v >> 32 for v in flat], dtype=np.uint32).reshape(shape)
        lo = np.asarray([v & 0xFFFFFFFF for v in flat],
                        dtype=np.uint32).reshape(shape)
        return jnp.asarray(np.stack([hi, lo]))

    def ones_mont(self, count: int):
        return jnp.stack([jnp.zeros((count,), _U32),
                          jnp.ones((count,), _U32)])

    def to_ints(self, host_arr) -> list[int]:
        """Host (2, ...) array -> python ints (flattened lane order)."""
        a = np.asarray(host_arr).astype(np.uint64)
        return [int(h) << 32 | int(l)
                for h, l in zip(a[0].reshape(-1), a[1].reshape(-1))]

    # -- 64-bit pair primitives -------------------------------------------
    # All conditionals are ARITHMETIC 0/1 masks, never jnp.where: XLA:CPU's
    # LLVM backend explodes exponentially optimizing deep chains of
    # select ops (measured: a 24-deep mul chain of the where-formulation
    # never finished; the mask formulation runs in milliseconds).  TPU
    # vector codegen treats both identically.
    def _ge_p_mask(self, hi, lo):
        """0/1 mask: (hi, lo) >= p, i.e. hi == 2^32-1 and lo >= 1."""
        return ((hi == _U32(_LOW_MASK)) & (lo >= _U32(1))).astype(_U32)

    def _sub_p_if(self, hi, lo, m):
        """(hi, lo) - m * p  mod 2^64  (m in {0,1}):  + m * (2^32 - 1)."""
        t = m * _U32(_LOW_MASK)
        nlo = lo + t
        carry = ((nlo < lo) & (m == _U32(1))).astype(_U32)
        return hi + carry, nlo

    def _add_p_if(self, hi, lo, m):
        """(hi, lo) + m * p  mod 2^64  (m in {0,1}):  - m * (2^32 - 1)."""
        nlo = lo + m
        carry = ((nlo == 0) & (m == _U32(1))).astype(_U32)
        return hi + m * _U32(_LOW_MASK) + carry, nlo

    def canon(self, a):
        """Reduce a (2,)+lanes pair in [0, 2^64) into [0, p)."""
        hi, lo = a[0], a[1]
        hi, lo = self._sub_p_if(hi, lo, self._ge_p_mask(hi, lo))
        return _pair(hi, lo)

    def _add64(self, ahi, alo, bhi, blo):
        """Raw pair add with modular wrap: valid when a + b < 2^64 + p."""
        lo = alo + blo
        c = (lo < alo).astype(_U32)
        hi0 = ahi + bhi
        ov1 = (hi0 < ahi).astype(_U32)
        hi = hi0 + c
        ov2 = (hi < c).astype(_U32)
        need = (ov1 | ov2 | self._ge_p_mask(hi, lo)).astype(_U32)
        return self._sub_p_if(hi, lo, need)

    # -- canonical ops -----------------------------------------------------
    def add(self, a, b):
        hi, lo = self._add64(a[0], a[1], b[0], b[1])
        return _pair(hi, lo)

    def sub(self, a, b):
        ahi, alo = a[0], a[1]
        bhi, blo = b[0], b[1]
        lo = alo - blo
        bor1 = (alo < blo).astype(_U32)
        hi0 = ahi - bhi
        und1 = (ahi < bhi).astype(_U32)
        hi = hi0 - bor1
        und2 = (hi0 < bor1).astype(_U32)
        hi, lo = self._add_p_if(hi, lo, und1 | und2)
        return _pair(hi, lo)

    def neg(self, a):
        zero = jnp.zeros_like(a)
        return self.sub(zero, a)

    def mul(self, a, b):
        ahi, alo = a[0], a[1]
        bhi, blo = b[0], b[1]
        h00, l00 = _mulhilo32(alo, blo)
        h01, l01 = _mulhilo32(alo, bhi)
        h10, l10 = _mulhilo32(ahi, blo)
        h11, l11 = _mulhilo32(ahi, bhi)
        # 128-bit accumulate: limbs c0..c3
        c0 = l00
        s1 = h00 + l01
        k1 = (s1 < h00).astype(_U32)
        c1 = s1 + l10
        k2 = (c1 < s1).astype(_U32)
        s2 = h01 + h10
        k3 = (s2 < h01).astype(_U32)
        s2b = s2 + l11
        k4 = (s2b < s2).astype(_U32)
        c2 = s2b + k1 + k2
        k5 = (c2 < s2b).astype(_U32)
        c3 = h11 + k3 + k4 + k5  # exact: true top limb < 2^32
        # reduce: result = lo64 - c3 + c2 * (2^32 - 1)   (mod p)
        bor = (c0 < c3).astype(_U32)
        tlo = c0 - c3
        thi = c1 - bor
        und = (c1 < bor).astype(_U32)
        thi, tlo = self._add_p_if(thi, tlo, und)
        # t may still be >= p (lo64 itself can be); canonicalize
        thi, tlo = self._sub_p_if(thi, tlo, self._ge_p_mask(thi, tlo))
        # u = c2 * (2^32 - 1) = (c2 - 1, 2^32 - c2) for c2 >= 1, else 0
        nz = (c2 != 0).astype(_U32)
        uhi = (c2 - _U32(1)) * nz
        ulo = _U32(0) - c2
        rhi, rlo = self._add64(thi, tlo, uhi, ulo)
        return _pair(rhi, rlo)

    def sqr(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    # -- "Montgomery" domain (identity) -----------------------------------
    def mont_mul(self, a, b):
        return self.mul(a, b)

    def mont_sqr(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return a

    def from_mont(self, a):
        return a

    @property
    def one_mont(self) -> int:
        return 1

    # -- chain breaking ----------------------------------------------------
    # XLA:CPU's LLVM backend takes exponential time on deep chains of the
    # wide multiply-accumulate DAG this field's mul produces (a 24-deep
    # unbroken chain never finishes; with barriers, depth-128 runs in
    # seconds).  Every long sequential construct below inserts an
    # optimization barrier each few muls; on TPU the only cost is a lost
    # fusion opportunity at those (setup-time, cached) spots.
    _BREAK_EVERY = 4

    @staticmethod
    def chain_break(x):
        return jax.lax.optimization_barrier(x)

    # -- powers / inversion ------------------------------------------------
    def pow_static(self, a, exp: int):
        exp = int(exp)
        if exp < 0:
            raise ValueError("negative exponent; invert first")
        ones = jnp.broadcast_to(
            jnp.stack([jnp.zeros((), _U32), jnp.ones((), _U32)])
            .reshape((2,) + (1,) * (a.ndim - 1)), a.shape)
        if exp == 0:
            return ones
        am = a
        acc = None
        e = exp
        steps = 0
        while e:
            if e & 1:
                acc = am if acc is None else self.mul(acc, am)
            e >>= 1
            if e:
                am = self.mul(am, am)
            steps += 1
            if steps % self._BREAK_EVERY == 0:
                am = self.chain_break(am)
                if acc is not None:
                    acc = self.chain_break(acc)
        return acc

    def inv(self, a):
        return self.pow_static(a, self.p - 2)

    def inv_rolled(self, a):
        """Fermat inverse as a fori_loop (see fp.Fp.inv_rolled): O(1)
        program size vs ~30k unrolled HLO ops — and the rolled body
        needs NO chain_break scaffolding (each iteration is its own
        compiled region, so XLA:CPU's deep-select-chain pathology never
        forms)."""
        e = self.p - 2
        nbits = e.bit_length()
        bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)],
                           dtype=_U32)
        ones = jnp.broadcast_to(
            jnp.stack([jnp.zeros((), _U32), jnp.ones((), _U32)])
            .reshape((2,) + (1,) * (a.ndim - 1)), a.shape)

        def body(i, st):
            am, acc = st
            acc = jnp.where(bits[i] == _U32(1), self.mul(acc, am), acc)
            return self.mul(am, am), acc

        _, acc = jax.lax.fori_loop(0, nbits, body, (a, ones))
        return acc

    # -- series / tables ---------------------------------------------------
    def powers(self, base: int, count: int):
        base = int(base) % self.p
        out = self.ones_mont(1)
        c = 1
        while c < count:
            step = self.const(pow(base, c, self.p))[:, None]
            out = self.chain_break(
                jnp.concatenate([out, self.mul(out, step)], axis=-1))
            c *= 2
        return out[..., :count]

    def geometric_table(self, ratios, count: int):
        """T[:, i, j] = ratios[:, i]^j — input (2, m), output (2, m, count)."""
        m = ratios.shape[-1]
        cols = jnp.stack([jnp.zeros((m, 1), _U32), jnp.ones((m, 1), _U32)])
        cur = ratios[..., None]
        c = 1
        while c < count:
            cols = self.chain_break(jnp.concatenate(
                [cols, self.mul(cols, cur)], axis=-1)[..., :count])
            cur = self.chain_break(self.mul(cur, cur))
            c *= 2
        return cols

    def sum(self, a, axis=None):
        if axis is None:
            a = a.reshape(2, -1)
            axis = 1
        if axis == 0:
            raise ValueError("axis 0 is the limb plane")
        n = a.shape[axis]
        level = 0
        while n > 1:
            half = n // 2
            lo = jax.lax.slice_in_dim(a, 0, half, axis=axis)
            hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=axis)
            s = self.add(lo, hi)
            if n % 2:
                tail = jax.lax.slice_in_dim(a, 2 * half, n, axis=axis)
                s = jnp.concatenate([s, tail], axis=axis)
            level += 1
            a = self.chain_break(s) if level % self._BREAK_EVERY == 0 else s
            n = a.shape[axis]
        return jnp.squeeze(a, axis=axis)

    # -- host constant-table builders ---------------------------------------
    # Same contract as fp.Fp.host_*: static-argument tables built with
    # vectorized numpy (no XLA compile), output in the class's device
    # layout ((2, ...) u32 limb pairs).  mulmod uses the classic
    # Goldilocks 128-bit reduction (2^64 = 2^32 - 1, 2^96 = -1 mod p) on
    # wrapping uint64, cross-checked against python ints in tests.
    @staticmethod
    def _np_mulmod(a, b):
        import numpy as np

        M32 = np.uint64(0xFFFFFFFF)
        s32 = np.uint64(32)
        with np.errstate(over="ignore"):
            a0, a1 = a & M32, a >> s32
            b0, b1 = b & M32, b >> s32
            ll = a0 * b0
            lh = a0 * b1
            hl = a1 * b0
            hh = a1 * b1
            m = lh + hl
            cm = (m < lh).astype(np.uint64)
            lo = ll + ((m & M32) << s32)
            cl = (lo < ll).astype(np.uint64)
            hi = hh + (m >> s32) + (cm << s32) + cl
            n1, n2 = hi & M32, hi >> s32
            borrow = lo < n2
            t = lo - n2
            t = np.where(borrow, t - M32, t)  # 2^64 = eps (mod p)
            t1 = n1 * M32  # n1 * eps, < 2^64
            r = t + t1
            carry = r < t
            r = np.where(carry, r + M32, r)
            P = np.uint64(GOLDILOCKS)
            return np.where(r >= P, r - P, r)

    @staticmethod
    def _np_pair(u64):
        import numpy as np

        return np.stack([(u64 >> np.uint64(32)).astype(np.uint32),
                         (u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)])

    def host_powers(self, base: int, count: int, mont: bool = False):
        import numpy as np

        base = int(base) % self.p
        out = np.ones(1, dtype=np.uint64)
        c = 1
        while c < count:
            out = np.concatenate(
                [out, self._np_mulmod(out, np.uint64(pow(base, c, self.p)))])
            c *= 2
        return self._np_pair(out[:count])  # mont is the identity here

    def host_geometric_table(self, ratios, count: int, mont: bool = False):
        """ratios: (2, m) limb pairs (host or device) -> (2, m, count)."""
        import numpy as np

        r = np.asarray(ratios, dtype=np.uint64)
        r = (r[0] << np.uint64(32)) | r[1]
        cols = np.ones(r.shape + (1,), dtype=np.uint64)
        cur = r[..., None]
        c = 1
        while c < count:
            cols = np.concatenate(
                [cols, self._np_mulmod(cols, cur)], axis=-1)[..., :count]
            cur = self._np_mulmod(cur, cur)
            c *= 2
        return self._np_pair(cols)

    # -- jitted entry points ----------------------------------------------
    @functools.cached_property
    def jit_add(self):
        return jax.jit(self.add)

    @functools.cached_property
    def jit_sub(self):
        return jax.jit(self.sub)

    @functools.cached_property
    def jit_mul(self):
        return jax.jit(self.mul)

    @functools.cached_property
    def jit_mont_mul(self):
        return jax.jit(self.mul)

    @functools.cached_property
    def jit_to_mont(self):
        return jax.jit(self.to_mont)

    @functools.cached_property
    def jit_from_mont(self):
        return jax.jit(self.from_mont)

    @functools.cached_property
    def jit_inv(self):
        return jax.jit(self.inv)

    @functools.cached_property
    def jit_pow_static(self):
        return jax.jit(self.pow_static, static_argnums=1)

    @functools.cached_property
    def jit_sum(self):
        return jax.jit(self.sum)

    # Constant-table builders answer from host numpy (see host_powers):
    # the device doubling builds cost an XLA compile per (size, base) —
    # and on XLA:CPU the deep mul chains need chain_break scaffolding —
    # while the tables are compile-time constants.
    @functools.cached_property
    def jit_powers(self):
        return lambda base, count: jnp.asarray(self.host_powers(base, count))

    @functools.cached_property
    def jit_geometric_table(self):
        return lambda ratios, count: jnp.asarray(
            self.host_geometric_table(ratios, count))

    @functools.cached_property
    def jit_coset_domain(self):
        import numpy as np

        def run(offset: int, omega: int, size: int):
            pw = self.host_powers(omega, size)
            u64 = (pw[0].astype(np.uint64) << np.uint64(32)) | pw[1]
            dom = self._np_mulmod(u64, np.uint64(int(offset) % self.p))
            return jnp.asarray(self._np_pair(dom))

        return run

    # -- domain helpers ----------------------------------------------------
    def two_adic_root(self, order: int, generator: int) -> int:
        if (self.p - 1) % order != 0:
            raise ValueError(f"{order} does not divide p-1 = {self.p - 1}")
        return pow(int(generator), (self.p - 1) // order, self.p)

    def coset_domain(self, offset: int, omega: int, size: int):
        pw = self.powers(omega, size)
        return self.mul(pw, self.const(offset)[:, None])
