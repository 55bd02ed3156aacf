"""Trace generation + trace polynomial — fills the reference's empty
``src/trace/{fibonacci.rs, blowup.rs}`` stubs (0 bytes, SURVEY §2) with
STARK-101 semantics.

The Fibonacci-square AIR: a_{i+2} = a_{i+1}^2 + a_i^2 over GF(p), with
public boundary a_0 = 1 and a_{T-1} the claimed output (for p = 3*2^30+1,
a_1 = 3141592 gives the famous a_1022 = 2338775057).

The trace polynomial f is the unique degree <= T-1 interpolant of
(g^i, a_i) for i < T, where T = N - 1 and g generates the order-N
subgroup.  STARK-101 builds it with O(N^2) Lagrange; here it is one INTT
plus a closed-form degree correction:

    INTT of (trace ++ [0]) gives coeffs0 of the interpolant with value 0
    at the unused point g^{N-1}; subtracting coeffs0[N-1] * L(x), where L
    is the Lagrange basis at g^{N-1} with coefficients
    L_i = g^{i+1} / N-normalization, zeroes the top coefficient while
    preserving the T interpolated values, giving exactly STARK-101's f.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.ntt import get_plan
from stark_tpu.ntt.reference_ntt import root_of_unity

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _trace_jit(p: int, length: int):
    f = Fp.get(p)
    wide = f.width > 1

    def gen(a0, a1):
        def step(carry, _):
            x, y = carry
            nxt = f.add(f.mul(x, x), f.mul(y, y))
            return (y, nxt), x

        (_, _), out = jax.lax.scan(step, (a0, a1), None, length=length)
        # scan stacks along axis 0; wide elements come out (length, 2)
        return out.T if wide else out

    return jax.jit(gen)


# Host endpoint cache for uploaded traces: publics extraction
# (air._elem_int) would otherwise fetch trace[0] / trace[-1] from device —
# two ~30-100 ms tunnel round trips per prove that the host already knows.
# Keyed by id() with a weakref.finalize purging entries when the device
# array dies (so a recycled id can never alias a stale entry).
import weakref as _weakref  # noqa: E402

_trace_endpoints: dict = {}


def host_endpoints(trace):
    """(first, last) host values (numpy, per leading lane) for a trace
    uploaded via upload_trace, or None if this array was not
    host-generated."""
    return _trace_endpoints.get(id(trace))


def upload_trace(host_u64, p: int):
    """Canonical uint64 numpy trace -> device layout ((n,) u32, or (2, n)
    limb pairs for 64-bit fields) without a per-element python loop."""
    import numpy as np

    f = Fp.get(p)
    arr = np.asarray(host_u64, dtype=np.uint64)
    if f.width == 1:
        dev = jnp.asarray(arr.astype(np.uint32))
    else:
        # limb planes go right before the trace axis so multi-column
        # traces keep (C, 2, n) — column-major rows, hi/lo per column
        dev = jnp.asarray(
            np.stack([(arr >> np.uint64(32)).astype(np.uint32),
                      (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                     axis=-2))
    key = id(dev)
    _trace_endpoints[key] = (arr[..., 0].copy(), arr[..., -1].copy())
    _weakref.finalize(dev, _trace_endpoints.pop, key, None)
    return dev


def host_or_device_trace(kind: str, p: int, arg0: int, arg1: int, n: int,
                         device_fallback):
    """AIR trace dispatch: the native host loop (C, ~1 ns/step — the
    recurrences are sequential, so the device lax.scan pays ~1 us/step of
    TPU loop overhead, 17 s at 2^24 rows) uploaded in one transfer, else
    `device_fallback()` (no toolchain, or STARK_TPU_DEVICE_TRACE=1; tests
    assert both paths produce identical traces)."""
    import os

    if not os.environ.get("STARK_TPU_DEVICE_TRACE"):
        from stark_tpu.native import host_trace

        host = host_trace(kind, p, arg0, arg1, n)
        if host is not None:
            return upload_trace(host, p)
    return device_fallback()


def fibonacci_square_trace(p: int, length: int, a0: int = 1, a1: int = 3141592):
    """(length,) device trace of the Fibonacci-square AIR; a (2, length)
    limb-pair array for 64-bit fields (see host_or_device_trace)."""
    f = Fp.get(p)
    return host_or_device_trace(
        "fib", p, a0, a1, length,
        lambda: _trace_jit(p, length)(f.const(a0), f.const(a1)))


@functools.lru_cache(maxsize=None)
def _trace_poly_jit(p: int, n: int, lead: tuple = ()):
    """trace (*lead, n-1) -> coeffs (*lead, n) of the degree <= n-2
    interpolants — `lead` carries multi-column traces (C,) and/or the
    64-bit limb plane (2,), each lane interpolated independently (one
    batched INTT)."""
    f = Fp.get(p)
    plan_i = get_plan(p, n, True)
    g = root_of_unity(p, n)

    def run(trace):
        padded = jnp.zeros(lead + (n,), _U32).at[..., : n - 1].set(trace)
        coeffs0 = plan_i(padded)
        tail = coeffs0[..., n - 1 : n]  # keep-dim: broadcasts over lead
        gp = f.mul(f.powers(g, n), f.const(g))  # g^{i+1}
        return f.sub(coeffs0, f.mul(gp, tail))

    return jax.jit(run)


def trace_polynomial(trace, p: int):
    """Coefficients (..., N) of STARK-101's trace interpolant, top
    coefficient identically zero (degree <= N-2); leading axes (columns,
    limb planes) batch.

    Multi-column 64-bit traces arrive (C, 2, n) — column-major rows, the
    layout the commitment and query phases consume — but the field ops
    (fields/fp64.py) want the limb plane LEADING, so the transform runs
    in (2, C, n) and the result moves back."""
    n = int(trace.shape[-1]) + 1
    if n & (n - 1):
        raise ValueError("trace length must be 2^k - 1")
    wide_cols = Fp.get(p).width > 1 and trace.ndim == 3
    if wide_cols:
        trace = jnp.moveaxis(trace, 1, 0)  # (C, 2, n) -> (2, C, n)
    out = _trace_poly_jit(p, n, tuple(trace.shape[:-1]))(trace)
    return jnp.moveaxis(out, 0, 1) if wide_cols else out
