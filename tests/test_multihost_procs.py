"""True multi-process distributed test: two OS processes form a
jax.distributed group over localhost (the DCN analog), each contributing
4 virtual CPU devices to one 8-device global mesh; the four-step NTT and
sharded Merkle run over cross-process collectives and must match the
single-device result (SURVEY §5.8 — validates the jax.distributed
bring-up path that real multi-host TPU pods use)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2,
    process_id={rank},
)
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stark_tpu.config import DEFAULT_MODULUS as MOD
from stark_tpu.dist import dist_ntt, dist_merkle_tree, make_mesh
from stark_tpu.ntt import ntt_host

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
mesh = make_mesh(devices=jax.devices())

n = 1 << 10
host_x = ((np.arange(n, dtype=np.uint64) * 48271) % MOD).astype(np.uint32)
x = jax.device_put(jnp.asarray(host_x), NamedSharding(mesh, P("shard")))

out = dist_ntt(x, MOD, mesh)
want = ntt_host(host_x, MOD).astype(np.uint32)
for shard in out.addressable_shards:
    sl = shard.index[0]
    np.testing.assert_array_equal(np.asarray(shard.data).reshape(-1),
                                  want[sl])

tree = dist_merkle_tree(x, mesh)
root = tree.root()  # top level replicated: fetch works on every process
from stark_tpu.merkle.tree import merkle_root_host
assert root == merkle_root_host(host_x.tolist()), root
print("RANK{rank}-OK", flush=True)
"""


def test_two_process_distributed_ntt_and_merkle():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "TPU_WORKER_HOSTNAMES",
                     "XLA_FLAGS", "PJRT_LIBRARY_PATH")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c",
             _WORKER.format(repo=REPO, port=port, rank=rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=600)
            outs.append((pr.returncode, out, err))
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail("distributed workers timed out")
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert f"RANK{rank}-OK" in out


_PROVE_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2,
    process_id={rank},
)
import hashlib
from stark_tpu.config import ProverConfig
from stark_tpu.dist import make_mesh
from stark_tpu.stark import prove, verify

mesh = make_mesh(devices=jax.devices())
cfg = ProverConfig(log2_trace=6, blowup=4, num_queries=2)
pr = prove(cfg, mesh=mesh)
digest = hashlib.sha256(b"".join(pr.proof)).hexdigest()
print("DIGEST", digest, flush=True)
assert verify(pr)
print("RANK{rank}-OK", flush=True)
"""


def test_two_process_full_sharded_prove():
    """BASELINE config #5's software story: a full STARK prove sharded
    over two processes' devices (2-'host' mesh); both ranks must produce
    the identical transcript, equal to the single-process proof."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "TPU_WORKER_HOSTNAMES",
                     "XLA_FLAGS", "PJRT_LIBRARY_PATH")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c",
             _PROVE_WORKER.format(repo=REPO, port=port, rank=rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=600)
            outs.append((pr.returncode, out, err))
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail("distributed prove workers timed out")
    digests = []
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert f"RANK{rank}-OK" in out
        digests.append([l for l in out.splitlines() if l.startswith("DIGEST")][0])
    assert digests[0] == digests[1], "transcripts diverged across hosts"

    # equal to the single-process proof
    import hashlib

    from stark_tpu.config import ProverConfig
    from stark_tpu.stark import prove

    solo = prove(ProverConfig(log2_trace=6, blowup=4, num_queries=2))
    solo_digest = "DIGEST " + hashlib.sha256(b"".join(solo.proof)).hexdigest()
    assert digests[0] == solo_digest


_AGREE_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.distributed.initialize(
    coordinator_address="localhost:{port}", num_processes=2,
    process_id={rank},
)
from stark_tpu.dist.multihost import check_transcript_agreement

# identical transcripts on both ranks: must pass
check_transcript_agreement([b"root-abc", b"beta-1", b"value-42"])
print("AGREE-OK", flush=True)

# rank-dependent transcript (simulated corruption on rank 1): must raise
corrupt = [b"root-abc", b"beta-1" if {rank} == 0 else b"beta-CORRUPT"]
try:
    check_transcript_agreement(corrupt)
except RuntimeError as e:
    assert "divergence" in str(e), e
    print("DIVERGE-DETECTED", flush=True)
else:
    print("DIVERGE-MISSED", flush=True)
print("RANK{rank}-OK", flush=True)
"""


def test_two_process_transcript_agreement_detection():
    """Cross-host failure detection (SURVEY §5.3): the digest allgather in
    check_transcript_agreement must pass on identical transcripts and
    raise on a corrupted rank — exercised over a real 2-process group."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "TPU_WORKER_HOSTNAMES",
                     "XLA_FLAGS", "PJRT_LIBRARY_PATH")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c",
             _AGREE_WORKER.format(repo=REPO, port=port, rank=rank)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=600)
            outs.append((pr.returncode, out, err))
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail("agreement workers timed out")
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert "AGREE-OK" in out
        assert "DIVERGE-DETECTED" in out
        assert "DIVERGE-MISSED" not in out
        assert f"RANK{rank}-OK" in out
