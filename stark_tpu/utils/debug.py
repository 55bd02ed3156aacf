"""Debug invariant checks (SURVEY §5.2).

JAX's functional purity removes data races (the reference's only
concurrency hazard surface); the remaining risk class is *value-domain*
corruption — a non-canonical uint32 sneaking into field math (e.g. a raw
hash word used as a field element).  The survey's prescription: assert
canonical-range invariants under a debug flag (the integer analog of
``jax_debug_nans``).

* :func:`assert_canonical` — host-side assertion on fetched arrays.
* :func:`check_canonical` — in-jit check via ``jax.experimental.checkify``
  (returns the checked value; errors surface when the caller runs the
  checkified function).
* ``STARK_TPU_DEBUG=1`` turns :func:`maybe_assert_canonical` from a no-op
  into a host assertion — sprinkled at phase boundaries without runtime
  cost in production.
"""

from __future__ import annotations

import os

import numpy as np


def debug_enabled() -> bool:
    return bool(os.environ.get("STARK_TPU_DEBUG"))


def assert_canonical(arr, p: int, name: str = "array") -> None:
    """Host assertion: every element in [0, p).

    Accepts the device layouts the prover actually carries: a single u32
    plane (p < 2^32), a limb-plane pair with leading dim 2 — ``(2, ...)``
    hi/lo u32 planes for 64-bit fields — or a tuple of per-column arrays
    (multi-column traces/LDEs)."""
    if isinstance(arr, (tuple, list)):
        for c, a in enumerate(arr):
            assert_canonical(a, p, f"{name}[col {c}]")
        return
    host = np.asarray(arr)
    if p < 1 << 32:
        vals = host.astype(np.uint64)
    elif host.ndim >= 1 and host.shape[0] == 2:
        vals = (host[0].astype(np.uint64) << np.uint64(32)) | host[1].astype(
            np.uint64)
    else:
        raise AssertionError(
            f"{name}: modulus {p} >= 2^32 but array shape {host.shape} is "
            "not a (2, ...) hi/lo limb-plane pair")
    bad = vals >= np.uint64(p)
    if bad.any():
        idx = int(np.argmax(bad.reshape(-1)))
        raise AssertionError(
            f"{name}: non-canonical value {int(vals.reshape(-1)[idx])} >= "
            f"modulus {p} at flat index {idx}"
        )


def maybe_assert_canonical(arr, p: int, name: str = "array") -> None:
    """assert_canonical when STARK_TPU_DEBUG is set; free otherwise."""
    if debug_enabled():
        assert_canonical(arr, p, name)


def check_canonical(x, p: int):
    """In-jit canonical-range check (use under jax.experimental.checkify):

        checked = checkify.checkify(lambda v: check_canonical(v, p))
        err, out = jax.jit(checked)(x)
        err.throw()
    """
    from jax.experimental import checkify
    import jax.numpy as jnp

    checkify.check(
        jnp.all(x < jnp.uint32(p)), "non-canonical field value (>= modulus)"
    )
    return x
