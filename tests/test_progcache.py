"""Program cache (utils/progcache) + packed fetch (utils/packfetch):
warm starts must skip tracing without ever changing a bit of output."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.utils import packfetch, progcache


# ---------------------------------------------------------------------------
# packfetch
# ---------------------------------------------------------------------------
def test_packed_get_matches_plain_pytree():
    tree = {
        "a": jnp.arange(7, dtype=jnp.uint32),
        "b": (jnp.arange(24, dtype=jnp.uint32).reshape(2, 3, 4),
              jnp.asarray([5], jnp.uint32)),
        "c": [jnp.asarray(9, jnp.uint32).reshape(())],
    }
    plain = jax.device_get(tree)
    packed = packfetch.device_get_packed(tree)
    flat_a, tree_a = jax.tree.flatten(plain)
    flat_b, tree_b = jax.tree.flatten(packed)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        assert x.shape == y.shape and x.dtype == y.dtype
        assert np.array_equal(x, y)


def test_packed_get_falls_back_on_mixed_dtypes():
    tree = (jnp.arange(4, dtype=jnp.uint32), jnp.arange(4, dtype=jnp.int32))
    out = packfetch.device_get_packed(tree)
    assert np.array_equal(out[0], np.arange(4))
    assert out[1].dtype == np.int32


def test_packed_get_empty_and_zero_size():
    assert packfetch.device_get_packed([]) == []
    tree = (jnp.zeros((0,), jnp.uint32), jnp.ones((3,), jnp.uint32))
    out = packfetch.device_get_packed(tree)  # zero-size leaf -> fallback
    assert out[0].shape == (0,)
    assert np.array_equal(out[1], np.ones(3))


# ---------------------------------------------------------------------------
# progcache
# ---------------------------------------------------------------------------
def _with_cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("STARK_TPU_COMPILE_CACHE", str(tmp_path))
    monkeypatch.delenv("STARK_TPU_NO_PROGRAM_CACHE", raising=False)
    monkeypatch.delenv("STARK_TPU_NO_COMPILE_CACHE", raising=False)


def test_cached_jit_roundtrip_and_hit(tmp_path, monkeypatch):
    _with_cache_dir(tmp_path, monkeypatch)

    def f(x, y):
        return (x * jnp.uint32(3) + y, x - y)

    a = jnp.arange(8, dtype=jnp.uint32)
    b = jnp.ones(8, jnp.uint32)
    want = jax.jit(f)(a, b)

    c1 = progcache.cached_jit(f, "t-roundtrip", (1,))
    got1 = c1(a, b)
    assert progcache.LAST_EVENTS["t-roundtrip"] == "miss"
    # a fresh CachedJit (simulating a new process) must hit the artifact
    c2 = progcache.cached_jit(f, "t-roundtrip", (1,))
    got2 = c2(a, b)
    assert progcache.LAST_EVENTS["t-roundtrip"] == "hit"
    for w, g1, g2 in zip(want, got1, got2):
        assert np.array_equal(np.asarray(w), np.asarray(g1))
        assert np.array_equal(np.asarray(w), np.asarray(g2))


def test_cached_jit_distinct_static_keys_do_not_collide(tmp_path,
                                                        monkeypatch):
    _with_cache_dir(tmp_path, monkeypatch)

    def make(c):
        def f(x):
            return x + jnp.uint32(c)

        return f

    a = jnp.zeros(4, jnp.uint32)
    assert int(progcache.cached_jit(make(1), "t-key", (1,))(a)[0]) == 1
    assert int(progcache.cached_jit(make(2), "t-key", (2,))(a)[0]) == 2
    # same key, fresh instance: must load c=1's artifact, not c=2's
    assert int(progcache.cached_jit(make(1), "t-key", (1,))(a)[0]) == 1
    assert progcache.LAST_EVENTS["t-key"] == "hit"


def test_cached_jit_shape_keyed(tmp_path, monkeypatch):
    _with_cache_dir(tmp_path, monkeypatch)

    def f(x):
        return x * jnp.uint32(2)

    c = progcache.cached_jit(f, "t-shapes", ())
    assert np.array_equal(c(jnp.ones(4, jnp.uint32)), 2 * np.ones(4))
    assert np.array_equal(c(jnp.ones(8, jnp.uint32)), 2 * np.ones(8))


def test_cached_jit_nested_under_trace_falls_back(tmp_path, monkeypatch):
    _with_cache_dir(tmp_path, monkeypatch)
    inner = progcache.cached_jit(lambda x: x + jnp.uint32(1), "t-nested", ())

    @jax.jit
    def outer(x):
        return inner(x) * jnp.uint32(2)

    assert int(outer(jnp.zeros((), jnp.uint32))) == 2


def test_source_fingerprint_stable():
    a = progcache._source_fingerprint()
    assert a == progcache._source_fingerprint()
    assert len(a) == 16


def test_source_fingerprint_skips_harness_modules():
    """Pure-harness sources (tunnel guard, logging, bench regression)
    must not key the program cache: an edit there cannot change a traced
    program, and invalidating every artifact over one costs minutes of
    TPU compile (measured r5: 46 s -> 225 s warm-cache first prove)."""
    import os

    import stark_tpu

    pkg = os.path.dirname(os.path.abspath(stark_tpu.__file__))
    hashed = set()
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith((".py", ".cpp", ".h")):
                rel = os.path.relpath(os.path.join(root, fn), pkg)
                if rel not in progcache._FINGERPRINT_EXCLUDE:
                    hashed.add(rel)
    # harness modules excluded ...
    assert os.path.join("utils", "tunnel.py") not in hashed
    assert os.path.join("utils", "logging.py") not in hashed
    # ... but every compute-path module is still hashed
    for rel in (os.path.join("fields", "fp.py"),
                os.path.join("ntt", "ntt.py"),
                os.path.join("stark", "prover.py"),
                os.path.join("utils", "debug.py"),
                os.path.join("utils", "packfetch.py"),
                "config.py"):
        assert rel in hashed, rel


def test_cpu_cache_dir_is_machine_scoped(monkeypatch):
    """CPU-default runs must scope the XLA persistent cache by host CPU
    identity: serialized XLA:CPU executables embed ISA features and are
    a latent SIGILL on any other machine (r4 VERDICT missing #5)."""
    import stark_tpu

    fp = stark_tpu._machine_fingerprint()
    assert fp == stark_tpu._machine_fingerprint()
    assert len(fp) == 12
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert stark_tpu._is_cpu_default()
    monkeypatch.setenv("JAX_PLATFORMS", "")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert not stark_tpu._is_cpu_default()
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
    assert stark_tpu._is_cpu_default()


def test_fn_digest_separates_closures():
    def make(k):
        return lambda f, rows, P: rows[0][0] + k

    assert progcache.fn_digest(make(1)) != progcache.fn_digest(make(2))
    assert progcache.fn_digest(make(3)) == progcache.fn_digest(make(3))
    assert progcache.fn_digest(None) is None


def test_corrupt_artifact_reexports(tmp_path, monkeypatch):
    _with_cache_dir(tmp_path, monkeypatch)

    def f(x):
        return x + jnp.uint32(7)

    a = jnp.zeros(3, jnp.uint32)
    progcache.cached_jit(f, "t-corrupt", ())(a)
    progs = os.path.join(str(tmp_path), "programs")
    (entry,) = [p for p in os.listdir(progs) if p.startswith("t-corrupt")]
    with open(os.path.join(progs, entry), "wb") as fh:
        fh.write(b"garbage")
    out = progcache.cached_jit(f, "t-corrupt", ())(a)
    assert progcache.LAST_EVENTS["t-corrupt"] == "miss"  # re-exported
    assert np.array_equal(out, 7 * np.ones(3))
