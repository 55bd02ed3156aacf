"""Batched prime-field arithmetic on uint32 arrays — the TPU compute path.

TPU-native replacement for the reference's scalar ``FieldElement`` ops
(reference: src/fields/element.rs:38-136).  Everything here is pure
``uint32``: a 64-bit product is formed as (hi, lo) limbs via 16-bit
decomposition, and reduction is Montgomery (REDC with R = 2^32).  No
64-bit types anywhere, so the identical code runs

* in plain jitted XLA on any backend, and
* inside Pallas TPU kernels (which have no u64),

and XLA constant-folds the per-modulus Montgomery constants because the
modulus is static per jit — the analog of the reference's const-generic
monomorphization (element.rs:8).

Supported moduli: odd, 2 < p < 2^32 (the reference's effective envelope —
its own ``pow`` overflows at p >= 2^32, element.rs:47).  Larger moduli are
served by the scalar host mirror only.

Conventions:
* "canonical" arrays hold values in [0, p).
* "mont" arrays hold x*R mod p.  Hot loops (NTT, FRI folds) stay in the
  Montgomery domain; boundaries (hashing, transcript) are canonical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _mulhilo32(a, b):
    """Full 64-bit product of two uint32 arrays as (hi, lo) uint32 pairs.

    16-bit limb decomposition; every intermediate fits uint32 (see the
    carry analysis in tests/test_fields.py::test_mulhilo_exhaustive_edges).
    """
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t = a0 * b0
    mid1 = a1 * b0 + (t >> 16)
    mid2 = a0 * b1 + (mid1 & 0xFFFF)
    hi = a1 * b1 + (mid1 >> 16) + (mid2 >> 16)
    lo = a * b  # wrapping low 32 bits
    return hi, lo


@functools.lru_cache(maxsize=None)
def _get(modulus: int):
    p = int(modulus)
    if p >= 1 << 32:
        from stark_tpu.fields.fp64 import GOLDILOCKS, Fp64Goldilocks

        if p == GOLDILOCKS:
            return Fp64Goldilocks(p)
        raise ValueError(
            f"no device path for modulus {p} >= 2^32 (only the Goldilocks "
            "prime 2^64 - 2^32 + 1 is supported above 32 bits); the scalar "
            "FieldElement host mirror handles arbitrary moduli")
    return Fp(modulus)


class Fp:
    """Field context for a fixed modulus; all methods are jit-traceable.

    Use :meth:`Fp.get` (cached) rather than the constructor.
    """

    def __init__(self, modulus: int):
        p = int(modulus)
        if p <= 2 or p % 2 == 0:
            raise ValueError(f"Fp requires an odd modulus > 2, got {p}")
        if p >= 1 << 32:
            raise ValueError(
                f"Fp device path supports moduli < 2^32, got {p}; "
                "use the scalar FieldElement mirror for larger fields"
            )
        self.p = p
        # -p^-1 mod 2^32 (Montgomery n')
        self.ninv = (-pow(p, -1, 1 << 32)) % (1 << 32)
        self.r = (1 << 32) % p          # R mod p == to_mont(1)
        self.r2 = self.r * self.r % p   # R^2 mod p

    get = staticmethod(_get)

    width = 1  # u32 limbs per element (the Goldilocks context has 2)

    # -- tiny helpers -----------------------------------------------------
    def _c(self, v: int):
        return _U32(v)

    def const(self, value: int):
        """A canonical scalar constant as a uint32 device scalar."""
        return _U32(value % self.p)

    def const_mont(self, value: int):
        """mont(value) as a device scalar (for width-generic plan code)."""
        return _U32(int(value) % self.p * self.r % self.p)

    def ones_mont(self, count: int):
        """(count,) array of mont(1) — width-generic twiddle filler."""
        return jnp.full((count,), _U32(self.r))

    def to_ints(self, host_arr) -> "list[int]":
        """Host array -> python ints (flattened) — width-generic."""
        import numpy as np

        return [int(v) for v in np.asarray(host_arr).reshape(-1)]

    def array(self, values) -> jax.Array:
        """Canonical uint32 device array from host ints (any magnitude)."""
        import numpy as np

        reduced = [int(v) % self.p for v in np.asarray(values, dtype=object).reshape(-1)]
        return jnp.asarray(
            np.asarray(reduced, dtype=np.uint32).reshape(np.shape(values))
        )

    # -- canonical-domain ops --------------------------------------------
    def add(self, a, b):
        """(a + b) mod p.  Correct for p up to 2^32 - 1 (sum may wrap)."""
        p = self._c(self.p)
        s = a + b
        ov = s < a  # wrapped past 2^32
        return jnp.where(ov | (s >= p), s - p, s)

    def sub(self, a, b):
        """(a - b) mod p, branch-free (cf. element.rs:89-91)."""
        p = self._c(self.p)
        d = a - b  # wraps when a < b
        return jnp.where(a < b, d + p, d)

    def neg(self, a):
        p = self._c(self.p)
        return jnp.where(a == 0, a, p - a)

    def mul(self, a, b):
        """(a * b) mod p on canonical inputs (two REDCs)."""
        return self.mont_mul(self.mont_mul(a, b), self._c(self.r2))

    def sqr(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    # -- Montgomery-domain ops -------------------------------------------
    def _redc(self, hi, lo):
        """REDC((hi,lo)) = (hi*2^32 + lo) * R^-1 mod p, output in [0, p)."""
        p = self._c(self.p)
        m = lo * self._c(self.ninv)          # mod 2^32
        mn_hi, _ = _mulhilo32(m, p)          # low limbs cancel by construction
        carry = (lo != _U32(0)).astype(_U32)
        s1 = hi + mn_hi
        ov1 = s1 < hi
        s2 = s1 + carry
        ov2 = s2 < s1
        need = ov1 | ov2 | (s2 >= p)
        return jnp.where(need, s2 - p, s2)

    def mont_mul(self, a, b):
        hi, lo = _mulhilo32(a, b)
        return self._redc(hi, lo)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        return self.mont_mul(a, self._c(self.r2))

    def from_mont(self, a):
        return self._redc(jnp.zeros_like(a), a)

    @property
    def one_mont(self) -> int:
        return self.r

    # -- powers / inversion ----------------------------------------------
    def pow_static(self, a, exp: int):
        """a ** exp for a *Python int* exponent (unrolled at trace time).

        Square-and-multiply in the Montgomery domain — the batched analog
        of the reference's scalar pow (element.rs:38-51).
        """
        exp = int(exp)
        if exp < 0:
            raise ValueError("negative exponent; invert first")
        if exp == 0:
            return jnp.full_like(a, _U32(1))
        am = self.to_mont(a)
        acc = None
        e = exp
        while e:
            if e & 1:
                acc = am if acc is None else self.mont_mul(acc, am)
            e >>= 1
            if e:
                am = self.mont_mul(am, am)
        return self.from_mont(acc)

    def pow(self, a, exp):
        """a ** exp for a *traced* uint32 exponent array (32 fixed rounds)."""
        am = self.to_mont(a)
        one = jnp.full_like(a, _U32(self.r))

        def body(i, carry):
            acc, base, e = carry
            hit = (e & _U32(1)) == _U32(1)
            acc = jnp.where(hit, self.mont_mul(acc, base), acc)
            return (acc, self.mont_mul(base, base), e >> 1)

        acc, _, _ = jax.lax.fori_loop(0, 32, body, (one, am, exp.astype(_U32)))
        return self.from_mont(acc)

    def inv(self, a):
        """Batched Fermat inverse a^(p-2) (element.rs:53-57).

        Fully parallel (~2*log2(p) mont_muls per lane) — on TPU this beats
        Montgomery batch inversion, whose prefix product serializes.
        """
        return self.pow_static(a, self.p - 2)

    def inv_rolled(self, a):
        """Fermat inverse with the square-and-multiply chain ROLLED into
        a fori_loop: one squaring + one masked multiply per iteration,
        so the traced program is O(1) ops instead of O(log p) unrolled
        multiplies.  Same FLOPs at runtime; use where program SIZE
        dominates (context-table setup — an unrolled wide-field inverse
        is a ~30k-op HLO whose compile dwarfs its execution, probe r5).
        """
        e = self.p - 2
        nbits = e.bit_length()
        bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], _U32)

        def body(i, st):
            am, acc = st
            acc = jnp.where(bits[i] == _U32(1), self.mont_mul(acc, am), acc)
            return self.mont_mul(am, am), acc

        _, acc = jax.lax.fori_loop(
            0, nbits, body,
            (self.to_mont(a), jnp.full_like(a, _U32(self.r))))
        return self.from_mont(acc)

    # -- series / tables --------------------------------------------------
    def powers(self, base: int, count: int):
        """[base^0, base^1, ..., base^(count-1)] canonical, built on device
        with log2(count) doubling steps (replaces the reference's per-point
        scalar pow loop, src/fri/coset_fri.rs:32-36)."""
        base = int(base) % self.p
        out = jnp.full((1,), _U32(self.r))  # mont(1)
        c = 1
        while c < count:
            # multiply existing block by base^c (host-computed constant)
            step_const = self.to_mont(self._c(pow(base, c, self.p)))
            out = jnp.concatenate([out, self.mont_mul(out, step_const)])
            c *= 2
        return self.from_mont(out[:count])

    def geometric_table(self, ratios, count: int):
        """T[i, j] = ratios[i]^j for j in [0, count) — batched doubling.

        Used for four-step NTT twiddle factors w^(i*j) = (w^i)^j.
        Input canonical (m,), output canonical (m, count).
        """
        rm = self.to_mont(ratios)
        cols = jnp.full(ratios.shape + (1,), _U32(self.r))
        cur = rm[..., None]
        c = 1
        while c < count:
            cols = jnp.concatenate([cols, self.mont_mul(cols, cur)], axis=-1)[..., :count]
            cur = self.mont_sqr(cur)
            c *= 2
        return self.from_mont(cols)

    def sum(self, a, axis=None):
        """Modular sum via pairwise tree reduction (plain jnp.sum would
        overflow uint32)."""
        if axis is None:
            a = a.reshape(-1)
            axis = 0
        n = a.shape[axis]
        while n > 1:
            half = n // 2
            lo = jax.lax.slice_in_dim(a, 0, half, axis=axis)
            hi = jax.lax.slice_in_dim(a, half, 2 * half, axis=axis)
            s = self.add(lo, hi)
            if n % 2:
                tail = jax.lax.slice_in_dim(a, 2 * half, n, axis=axis)
                s = jnp.concatenate([s, tail], axis=axis)
            a = s
            n = a.shape[axis]
        return jnp.squeeze(a, axis=axis)

    # -- jitted entry points ----------------------------------------------
    # Eager per-op dispatch is expensive; these cached jit wrappers are the
    # public API for standalone calls.  Inside a larger jitted computation,
    # call the plain methods — XLA fuses them with their surroundings.
    @functools.cached_property
    def jit_add(self):
        return jax.jit(self.add)

    @functools.cached_property
    def jit_sub(self):
        return jax.jit(self.sub)

    @functools.cached_property
    def jit_neg(self):
        return jax.jit(self.neg)

    @functools.cached_property
    def jit_mul(self):
        return jax.jit(self.mul)

    @functools.cached_property
    def jit_mont_mul(self):
        return jax.jit(self.mont_mul)

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
    def jit_pow(self):
        return jax.jit(self.pow)

    @functools.cached_property
    def jit_pow_static(self):
        return jax.jit(self.pow_static, static_argnums=1)

    @functools.cached_property
    def jit_sum(self):
        return jax.jit(self.sum)

    # Constant-table builders: all arguments are static, so the tables are
    # compile-time constants — building them on HOST (vectorized numpy,
    # u64-safe since operands < 2^32) and uploading costs no XLA compile.
    # A cold prove used to spend ~20 s compiling ~30 one-shot table
    # programs (coset domains per FRI layer, twiddles per size); now each
    # is a fraction of a millisecond of numpy.  The names keep their jit_*
    # form because they are drop-in: same signature, same device output.
    def host_powers(self, base: int, count: int, mont: bool = False):
        """numpy uint32 [base^0 .. base^(count-1)], canonical (or mont)."""
        import numpy as np

        p = self.p
        base = int(base) % p
        out = np.ones(1, dtype=np.uint64)
        c = 1
        while c < count:
            out = np.concatenate([out, out * np.uint64(pow(base, c, p)) % np.uint64(p)])
            c *= 2
        out = out[:count]
        if mont:
            out = out * np.uint64(self.r) % np.uint64(p)
        return out.astype(np.uint32)

    def host_geometric_table(self, ratios, count: int, mont: bool = False):
        """numpy uint32 T[i, j] = ratios[i]^j, canonical (or mont)."""
        import numpy as np

        p = np.uint64(self.p)
        r = np.asarray(ratios, dtype=np.uint64) % p
        cols = np.ones(r.shape + (1,), dtype=np.uint64)
        cur = r[..., None]
        c = 1
        while c < count:
            cols = np.concatenate([cols, cols * cur % p], axis=-1)[..., :count]
            cur = cur * cur % p
            c *= 2
        if mont:
            cols = cols * np.uint64(self.r) % p
        return cols.astype(np.uint32)

    @functools.cached_property
    def jit_powers(self):
        return lambda base, count: jnp.asarray(self.host_powers(base, count))

    @functools.cached_property
    def jit_geometric_table(self):
        import numpy as np

        return lambda ratios, count: jnp.asarray(
            self.host_geometric_table(np.asarray(ratios), count))

    @functools.cached_property
    def jit_coset_domain(self):
        import numpy as np

        def run(offset: int, omega: int, size: int):
            pw = self.host_powers(omega, size).astype(np.uint64)
            dom = pw * np.uint64(int(offset) % self.p) % np.uint64(self.p)
            return jnp.asarray(dom.astype(np.uint32))

        return run

    # -- domain helpers ---------------------------------------------------
    def two_adic_root(self, order: int, generator: int) -> int:
        """A primitive `order`-th root of unity (host int)."""
        if (self.p - 1) % order != 0:
            raise ValueError(f"{order} does not divide p-1 = {self.p - 1}")
        root = pow(int(generator), (self.p - 1) // order, self.p)
        return root

    def coset_domain(self, offset: int, omega: int, size: int):
        """{offset * omega^i : i in [0, size)} as one fused device op
        (TPU-native replacement for coset_fri.rs:32-36)."""
        pw = self.powers(omega, size)
        return self.mul(pw, self.const(offset))
