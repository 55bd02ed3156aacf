"""Pinpoint which part of the fused FRI layer step (fri/commit._layer_jit)
explodes the XLA:TPU compile (hung >15 min at m=2^17 where the separate
programs compile in ~1-3 s each).  Compiles each combination under a
fresh cache with incremental prints."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["STARK_TPU_COMPILE_CACHE"] = f"/tmp/fuse_{os.getpid()}"

import jax
import jax.numpy as jnp
import numpy as np

P = 3 * 2**30 + 1
M = 1 << 17


def timeit(name, fn, *args):
    t0 = time.time()
    r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)
    return r


def main():
    from stark_tpu.channel.device_channel import absorb_digest, \
        draw_field_element
    from stark_tpu.fri.commit import _fold_fn, _inv_domain
    from stark_tpu.merkle.tree import build_levels_fn

    fold = _fold_fn(P, M)
    build = build_levels_fn(M // 2, wide=False)
    inv_dom = _inv_domain(P, M, 3)
    evals = jnp.arange(M, dtype=jnp.uint32) % jnp.uint32(P)
    state = jnp.arange(8, dtype=jnp.uint32) + jnp.uint32(7)
    beta = jnp.uint32(12345)

    timeit("a fold alone", jax.jit(fold), evals, beta, inv_dom)
    timeit("b build alone", jax.jit(lambda v: build(v)), evals[: M // 2])
    timeit("c draw alone", jax.jit(lambda s: draw_field_element(s, P)), state)
    timeit("d absorb alone", jax.jit(absorb_digest), state, state)

    def fold_build(ev, b, d):
        return build(fold(ev, b, d))

    timeit("e fold+build", jax.jit(fold_build), evals, beta, inv_dom)

    def draw_fold(s, ev, d):
        b, s2 = draw_field_element(s, P)
        return fold(ev, b, d), s2

    timeit("f draw+fold", jax.jit(draw_fold), state, evals, inv_dom)

    def draw_fold_build(s, ev, d):
        b, s2 = draw_field_element(s, P)
        lv = build(fold(ev, b, d))
        return lv, s2

    timeit("g draw+fold+build", jax.jit(draw_fold_build), state, evals,
           inv_dom)

    def full(s, ev, d):
        b, s2 = draw_field_element(s, P)
        lv = build(fold(ev, b, d))
        s3 = absorb_digest(s2, lv[-1][0])
        return lv, s3, b

    timeit("h full step m=2^17", jax.jit(full), state, evals, inv_dom)

    # the production _layer_jit at other sizes: the gated smalls first,
    # then the size that hung the compile service (m=2^12) LAST so a
    # repeat hang doesn't mask the rest
    from stark_tpu.fri.commit import _layer_jit

    for logm in (11, 10, 14, 13, 12):
        m = 1 << logm
        ev = jnp.arange(m, dtype=jnp.uint32) % jnp.uint32(P)
        timeit(f"layer_jit m=2^{logm}", _layer_jit(P, m), state, ev,
               _inv_domain(P, m, 3))
    print("PROBE-F DONE", flush=True)


if __name__ == "__main__":
    main()
