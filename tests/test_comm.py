"""Communication accounting (SURVEY §5.7-5.8, VERDICT r1 item 8): the
analytic collective model must agree with what XLA actually inserts, and
the FRI fold re-shard schedule is pinned explicitly."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stark_tpu.config import DEFAULT_MODULUS as MOD
from stark_tpu.dist import comm, dist_ntt, make_mesh
from stark_tpu.dist.mesh import SHARD_AXIS

pytestmark = pytest.mark.skipif(
    len(jax.local_devices(backend="cpu")) < 8, reason="needs 8 cpu devices"
)


def _mesh():
    return make_mesh(8, devices=jax.local_devices(backend="cpu"))


def test_ntt_analytic_collectives():
    n, s = 1 << 12, 8
    cols = comm.ntt_collectives(n, s)
    assert len(cols) == 3
    for c in cols:
        assert c.kind == "all_to_all"
        # each chip keeps 1/s of its n/s local block
        assert c.per_chip_bytes == (n // s) * 4 * (s - 1) // s
        assert c.wire_bytes == c.per_chip_bytes * s
    assert comm.ntt_collectives(n, 1) == []


def test_ntt_hlo_matches_analytic():
    """The compiled sharded NTT contains exactly the 3 all_to_alls the
    model predicts, each moving one local block per partition."""
    n, s = 1 << 12, 8
    mesh = _mesh()
    x = jax.device_put(
        jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(MOD),
        NamedSharding(mesh, P(SHARD_AXIS)),
    )
    # compile via the plan's own jit cache path
    from stark_tpu.dist.ntt import _dist_plan

    plan = _dist_plan(MOD, n, s, False)
    plan.run(x, mesh)  # populate cache
    fn = plan._jit_cache[(id(mesh), 0)]  # 0 leading axes (u32 codeword)
    txt = fn.lower(x, plan._twiddle).compile().as_text()
    found = [c for c in comm.hlo_collectives(txt) if c["kind"] == "all-to-all"]
    assert len(found) == 3, comm.count_hlo_kinds(txt)
    for c in found:
        # per-partition payload = the local (rows/s, cols) block
        assert c["bytes_per_partition"] == (n // s) * 4


def test_fri_fold_schedule_pinned():
    n, s = 1 << 12, 8
    sched = comm.fri_fold_schedule(n, s, num_folds=8)
    ops = [st["op"] for st in sched]
    # sharded while big, exactly one gather, local afterwards
    assert ops[0] == "fold_sharded"
    assert ops.count("gather_tail") == 1
    gi = ops.index("gather_tail")
    assert all(o == "fold_sharded" for o in ops[:gi])
    assert all(o == "fold_local" for o in ops[gi + 1:])
    # sizes halve; sharded folds move exactly half the layer
    for st in sched:
        if st["op"] == "fold_sharded":
            assert st["wire_bytes"] == (st["size"] // 2) * 4
        if st["op"] == "fold_local":
            assert st["wire_bytes"] == 0
    # single device: never any wire traffic
    assert all(st["wire_bytes"] == 0 for st in comm.fri_fold_schedule(n, 1, 8))


def test_sharded_fold_collective_is_bounded():
    """Pin GSPMD's lowering of the sharded FRI fold: the collectives XLA
    inserts move at most one half-layer per partition (the analytic bound;
    VERDICT r1 weakness: 'communication pattern unexamined')."""
    from stark_tpu.fri.commit import _fold_jit, _inv_domain

    n, s = 1 << 12, 8
    mesh = _mesh()
    sh = NamedSharding(mesh, P(SHARD_AXIS))
    evals = jax.device_put(
        jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(MOD), sh)
    beta = jnp.uint32(12345)
    inv = jax.device_put(_inv_domain(MOD, n, 1), NamedSharding(mesh, P(None)))
    fn = _fold_jit(MOD, n)
    txt = fn.lower(evals, beta, inv).compile().as_text()
    cols = comm.hlo_collectives(txt)
    # every collective payload <= half-layer per partition (+small slack)
    for c in cols:
        assert c["bytes_per_partition"] <= (n // 2) * 4, c
    total = sum(c["bytes_per_partition"] for c in cols)
    assert total <= n * 4, (total, comm.count_hlo_kinds(txt))


def test_scaling_report(tmp_path):
    path = os.path.join(tmp_path, "scaling.json")
    rep = comm.write_scaling_report(path, log2_trace=20, blowup=8)
    rows = {r["devices"]: r for r in rep["rows"]}
    assert rows[1]["wire_bytes"] == 0
    assert rows[1]["efficiency"] == pytest.approx(1.0)
    # BASELINE north star: >=80% efficiency at 2 devices
    assert rows[2]["efficiency"] >= 0.8
    # efficiency monotonically non-increasing with device count
    effs = [r["efficiency"] for r in rep["rows"]]
    assert all(a >= b - 1e-9 for a, b in zip(effs, effs[1:]))
    with open(path) as f:
        assert json.load(f)["rows"]


def test_prove_collectives_inventory():
    cols = comm.prove_collectives(log2_trace=10, blowup=4, s=8)
    names = [c.name for c in cols]
    assert sum("all_to_all" in n for n in names) == 12  # 4 NTTs x 3
    assert sum("root_gather" in n for n in names) >= 2
    assert any("fri/" in n for n in names)
    assert all(c.wire_bytes >= c.per_chip_bytes for c in cols)
