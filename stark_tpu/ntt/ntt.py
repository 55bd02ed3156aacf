"""Device NTT/INTT and low-degree extension — the TPU compute path.

Radix-2 Stockham autosort NTT over GF(p) on uint32 arrays:

* no bit-reversal permutation and no gathers — every stage is a
  reshape + contiguous slice + butterfly (add/sub + one Montgomery mul),
  which XLA fuses and lays out without scatter/gather traffic;
* data stays in the Montgomery domain across all log2(n) stages
  (one to_mont on entry, one from_mont on exit);
* twiddle tables are built on device with log-depth doubling and cached
  per (modulus, size, direction).

This is the production replacement for the reference's O(n^2) Lagrange
stack (reference: src/polynomial/interpolation.rs:80-151) and the "blowup"
stub (reference: src/trace/blowup.rs, 0 bytes): LDE = INTT -> coefficient
scale -> zero-pad -> NTT on the larger coset.

The host oracle with the identical dataflow lives in
stark_tpu.ntt.reference_ntt; tests cross-check stage-for-stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.reference_ntt import ntt_available, root_of_unity

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def get_plan(p: int, n: int, inverse: bool = False):
    """Best single-device plan for the size: the 1-D Stockham plan for
    small n, a placement-dispatching plan for large n (Pallas fused
    kernels when the operand lives on a TPU, the XLA four-step
    otherwise) — bit-identical outputs every way.

    Two-limb fields (Goldilocks, fields/fp64.py) take the width-generic
    XLA four-step at large sizes (stages_axis0 rides the limb plane as a
    leading batch dim); only the Pallas fused path stays u32-only."""
    from stark_tpu.ntt.fourstep import FOURSTEP_MIN, get_fourstep_plan

    if n >= FOURSTEP_MIN:
        if Fp.get(p).width == 1:
            return _AutoPlan(p, n, inverse)
        return get_fourstep_plan(p, n, inverse)
    return NTTPlan(p, n, inverse)


# Pallas fused-kernel envelope (validated on TPU v5e hardware):
# n1, n2 >= 128 requires n >= 2^14; above 2^22 a sqrt(n) sub-transform
# no longer fits the 16 MB scoped-VMEM limit (rows > 2048 OOM, and
# Mosaic rejects sub-128-lane blocks) — those sizes take the 3-step
# decomposition (pallas_ntt._ThreeStepNTT: one outer XLA radix split,
# inner rows on the fused 2-step kernels) up to 2^30.
PALLAS_MIN = 1 << 14
PALLAS_MAX = 1 << 22
PALLAS3_MAX = 1 << 30


class _AutoPlan:
    """Value-placement dispatch, mirroring merkle/tree.py's Pallas tree
    selection (commit 8ffc308): concrete 1-D operands resident on a TPU
    take the fused Pallas path (stark_tpu.ntt.pallas_ntt); tracers
    (plans nested in an outer jit), batched operands, and CPU/other
    backends take the XLA four-step.  Outputs are bit-identical, so the
    choice never affects transcripts."""

    def __init__(self, p: int, n: int, inverse: bool):
        from stark_tpu.ntt.fourstep import get_fourstep_plan

        self._xla = get_fourstep_plan(p, n, inverse)
        self._key = (p, n, inverse)

    def __call__(self, x) -> jax.Array:
        p, n, inverse = self._key
        if (
            PALLAS_MIN <= n <= PALLAS3_MAX
            and getattr(x, "ndim", 0) == 1
            and not isinstance(x, jax.core.Tracer)
        ):
            try:
                on_tpu = next(iter(x.devices())).platform == "tpu"
            except Exception:
                on_tpu = False
            if on_tpu:
                if n > PALLAS_MAX:
                    from stark_tpu.ntt.pallas_ntt import _plan3

                    return _plan3(p, n, inverse, False)(x)
                from stark_tpu.ntt.pallas_ntt import _plan as _pallas_plan

                return _pallas_plan(p, n, inverse, False)(x)
        return self._xla(x)

    def __getattr__(self, name):
        return getattr(self._xla, name)


@functools.lru_cache(maxsize=None)
def get_stockham_plan(p: int, n: int, inverse: bool = False) -> "NTTPlan":
    return NTTPlan(p, n, inverse)


def stockham_stages(fp: Fp, n: int, xm, twiddles):
    """All butterfly stages along the LAST axis; leading axes batch
    (for two-limb fields the leading limb plane rides along as batch).
    Montgomery domain in/out, natural order (Stockham autosort).

    Stage pairs run as one radix-4 butterfly (same fusion and exact
    bit-identity argument as fourstep.stages_axis0 — one HBM pass where
    XLA would materialize two).  Gated on total work (RADIX4_MIN_ELEMS):
    measured on v5e, radix-4 wins only once the working set spills HBM
    caches (2^24: 12.9 -> 8.4 ms; 2^22: a wash) while tripling XLA
    compile time, so smaller transforms keep the radix-2 graph."""
    from stark_tpu.ntt.fourstep import RADIX4_MIN_ELEMS

    batch = xm.shape[:-1]
    total = 1
    for s in xm.shape:
        total *= int(s)
    r4 = total >= RADIX4_MIN_ELEMS
    wide = getattr(fp, "width", 1) > 1
    l, m = n, 1
    i = 0
    while i < len(twiddles):
        if r4 and l >= 4 and i + 1 < len(twiddles):
            t_l, t_lh = twiddles[i], twiddles[i + 1]
            i += 2
            lq = l // 4
            v = xm.reshape(batch + (l, m))
            q0 = v[..., :lq, :]
            q1 = v[..., lq : 2 * lq, :]
            q2 = v[..., 2 * lq : 3 * lq, :]
            q3 = v[..., 3 * lq :, :]
            s02, d02 = fp.add(q0, q2), fp.sub(q0, q2)
            s13, d13 = fp.add(q1, q3), fp.sub(q1, q3)
            jj = t_l[..., lq : lq + 1]  # J = w_l^(l/4) (mont)
            jd13 = fp.mont_mul(jj[..., :, None], d13)
            w1 = t_l[..., :lq, None]
            w2 = t_lh[..., :lq, None]
            w3 = fp.mont_mul(w1, w2)
            y00 = fp.add(s02, s13)
            y01 = fp.mont_mul(w1, fp.add(d02, jd13))
            y10 = fp.mont_mul(w2, fp.sub(s02, s13))
            y11 = fp.mont_mul(w3, fp.sub(d02, jd13))
            top = jnp.stack([y00, y01], axis=-2)
            bot = jnp.stack([y10, y11], axis=-2)
            xm = jnp.stack([top, bot], axis=-3).reshape(batch + (n,))
            l, m = lq, 4 * m
        else:
            t = twiddles[i]
            i += 1
            lh = l // 2
            v = xm.reshape(batch + (l, m))
            a, b = v[..., :lh, :], v[..., lh:, :]
            top = fp.add(a, b)
            bot = fp.mont_mul(t[..., :, None], fp.sub(a, b))
            xm = jnp.stack([top, bot], axis=-2).reshape(batch + (n,))
            l, m = lh, 2 * m
        if wide:
            # break the LLVM-visible op chain per stage (see fp64.py)
            xm = fp.chain_break(xm)
    return xm


@functools.lru_cache(maxsize=None)
def _stage_twiddles(p: int, n: int, w: int) -> tuple:
    """All Stockham stage twiddles (mont form), built on host — the
    tables are compile-time constants, so the device doubling build was
    pure XLA-compile cost (fp.host_powers / fp64.host_powers)."""
    f = Fp.get(p)
    out = []
    l = n
    while l > 1:
        lh = l // 2
        wl = pow(w, n // l, p)
        out.append(jnp.asarray(f.host_powers(wl, lh, mont=True)))
        l = lh
    return tuple(out)


class NTTPlan:
    """Compiled NTT of fixed size n over GF(p).  Use :func:`get_plan`."""

    def __init__(self, p: int, n: int, inverse: bool):
        if n & (n - 1) or n < 1:
            raise ValueError(f"NTT size must be a power of two, got {n}")
        if not ntt_available(p, n):
            raise ValueError(f"GF({p}) has no order-{n} subgroup")
        self.p = p
        self.n = n
        self.inverse = inverse
        self.fp = Fp.get(p)
        w = root_of_unity(p, n)
        if inverse:
            w = pow(w, p - 2, p)
        self.w = w
        # Twiddles per stage, Montgomery form.  Stage with half-length lh
        # needs [wl^0 .. wl^(lh-1)], wl = w^(n/l) (a primitive l-th root).
        # Built in ONE jit call — per-stage dispatches cost ~0.5 s each of
        # round-trip latency on the tunneled TPU.
        self._twiddles = _stage_twiddles(p, n, w)
        self._ninv_mont = self.fp.const_mont(pow(n, p - 2, p))  # mont(n^-1)
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(self._transform, "ntt-stockham",
                               (p, n, inverse))

    # -- core -------------------------------------------------------------
    def _stages(self, xm, twiddles):
        return stockham_stages(self.fp, self.n, xm, twiddles)

    def _transform(self, x, twiddles):
        f = self.fp
        xm = f.to_mont(x)
        xm = self._stages(xm, twiddles)
        if self.inverse:
            xm = f.mont_mul(xm, self._ninv_mont)
        return f.from_mont(xm)

    def __call__(self, x) -> jax.Array:
        """Transform canonical uint32 array of shape (n,)."""
        return self._jit(x, self._twiddles)

    # Montgomery-domain entry for fusing into larger jitted pipelines.
    def mont_stages(self, xm):
        out = self._stages(xm, self._twiddles)
        if self.inverse:
            out = self.fp.mont_mul(out, self._ninv_mont)
        return out


# -- public functional API ---------------------------------------------------
def ntt(x, p: int) -> jax.Array:
    """Forward NTT, natural order: X[k] = sum_j x[j] w^(jk)."""
    return get_plan(p, int(x.shape[-1]), False)(x)


def intt(x, p: int) -> jax.Array:
    """Inverse NTT (includes the n^-1 scale)."""
    return get_plan(p, int(x.shape[-1]), True)(x)


@functools.lru_cache(maxsize=None)
def _scale_pad_jit(p: int, n: int, big_n: int, offset: int):
    f = Fp.get(p)

    def run(coeffs):
        shifted = f.mul(coeffs, f.powers(offset, n))
        return jnp.zeros(coeffs.shape[:-1] + (big_n,), dtype=_U32).at[
            ..., :n
        ].set(shifted)

    from stark_tpu.utils.progcache import cached_jit

    return cached_jit(run, "scale-pad", (p, n, big_n, offset))


def _lde_steps(p: int, n: int, big_n: int, offset: int):
    """coeff-domain pipeline: INTT_n -> scale by offset^i -> pad -> NTT_N.

    The plan calls stay SEPARATE jit invocations: nesting a plan inside an
    outer jit inlines its twiddle-table arguments as HLO literals (256 MB
    at 2^26 points — breaks compilation)."""
    plan_i = get_plan(p, n, True)
    scale = _scale_pad_jit(p, n, big_n, offset)
    plan_f = get_plan(p, big_n, False)

    def run(values):
        return plan_f(scale(plan_i(values)))

    return run


def lde(values, p: int, blowup: int, offset: int) -> jax.Array:
    """Low-degree extension ("blowup", the reference's empty
    src/trace/blowup.rs): interpret `values` as evaluations on the size-n
    subgroup (natural w^i order), return evaluations of the same polynomial
    on the coset {offset * W^i} of size blowup*n, where W is the canonical
    primitive (blowup*n)-th root.
    """
    n = int(values.shape[-1])
    return _lde_steps(p, n, blowup * n, int(offset) % p)(values)


def coset_evaluate(coeffs, p: int, big_n: int, offset: int) -> jax.Array:
    """Evaluate coefficient vector on {offset * W^i : i < big_n}.

    Multi-column 64-bit inputs arrive (C, 2, n) (column-major rows); the
    field ops want the limb plane leading, so the transform runs in
    (2, C, n) and the result moves back (see trace.trace_polynomial)."""
    n = int(coeffs.shape[-1])
    wide_cols = Fp.get(p).width > 1 and getattr(coeffs, "ndim", 1) == 3
    if wide_cols:
        coeffs = jnp.moveaxis(coeffs, 1, 0)
    scale = _scale_pad_jit(p, n, big_n, int(offset) % p)
    out = get_plan(p, big_n, False)(scale(coeffs))
    return jnp.moveaxis(out, 0, 1) if wide_cols else out


@functools.lru_cache(maxsize=None)
def _unscale_jit(p: int, n: int, offset: int):
    f = Fp.get(p)
    offset_inv = pow(int(offset) % p, p - 2, p)
    return jax.jit(lambda coeffs: f.mul(coeffs, f.powers(offset_inv, n)))


def coset_interpolate(evals, p: int, offset: int) -> jax.Array:
    """Coefficients of the polynomial whose values on {offset * w^i} are
    `evals` (inverse of :func:`coset_evaluate` at big_n == n)."""
    n = int(evals.shape[-1])
    return _unscale_jit(p, n, int(offset) % p)(get_plan(p, n, True)(evals))
