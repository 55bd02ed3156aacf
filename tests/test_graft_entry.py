"""Driver entry points must stay functional: entry() jit-compiles and
runs; dryrun_multichip exercises the sharded prove on the CPU mesh."""

import os
import sys

import jax


def test_entry_compiles_and_runs():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    shapes = [o.shape for o in out]
    assert shapes[0] == (1, 8)      # trace root digest
    assert shapes[1][0] == shapes[2][0] * 2  # cp and first fold


def test_dryrun_multichip_8(monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # keep the machine-scoped cache in tests (same-host-safe); the
    # driver's artifact run omits this and compiles fresh so its
    # MULTICHIP log carries no CPU-AOT feature-mismatch warnings
    monkeypatch.setenv("STARK_TPU_DRYRUN_CACHE", "1")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
