"""Multi-host process-group runtime (SURVEY §5.8).

The reference is single-process (rayon threads only); the TPU-native
communication stack is: ``jax.distributed.initialize`` forms the process
group, a global Mesh over all hosts' devices places the domain axis, and
XLA lowers the collectives (all_to_all for NTT transposes, psum/gather
for digest reduction) onto ICI within a slice and DCN across slices.
No NCCL/MPI analog is needed — this module is the thin host-side glue:

* :func:`initialize` — idempotent process-group setup from explicit args
  or standard cluster env vars (auto-detected on Cloud TPU).
* :func:`global_mesh` — 1-D mesh over every device of every host, shard
  axis first (SURVEY's sharded-domain design); optional 2-D
  (host, local) factorization so NTT all-to-alls can prefer ICI.
* :func:`multihost_prove` — rank-0-transcript convention: every host runs
  the identical deterministic prove (device collectives keep them in
  lockstep); the transcript is identical on all hosts by construction,
  so no broadcast is required — asserted via a digest psum in debug mode.

Testing story (no multi-host hardware here): all of this code also runs
with a single process over the 8 virtual CPU devices, which is how CI
exercises it (tests/test_dist.py); the process-group bring-up itself is
exercised as a no-op initialize().
"""

from __future__ import annotations

import os

import jax

from stark_tpu.dist.mesh import SHARD_AXIS, make_mesh

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    With no args, relies on JAX's cluster auto-detection (Cloud TPU
    metadata / SLURM / OMPI env).  Single-process runs (num_processes in
    (None with no cluster env, or 1)) skip initialization entirely.
    """
    global _initialized
    if _initialized:
        return
    explicit_single = num_processes == 1
    has_cluster_env = any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
                  "TPU_WORKER_HOSTNAMES")
    )
    if explicit_single or (coordinator_address is None and not has_cluster_env):
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def process_info() -> tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def global_mesh(backend: str | None = None):
    """1-D mesh over all devices of all hosts (jax.devices() is global
    after initialize())."""
    return make_mesh(devices=jax.devices(backend))


def multihost_prove(cfg, a1: int = 3141592, backend: str | None = None,
                    check_agreement: bool = False):
    """Run the sharded prover across every host's devices.

    Every process executes the same host code; sharded device collectives
    synchronize the chips, and because proving is deterministic the
    Fiat-Shamir transcripts are identical on every host (the distributed
    determinism oracle, SURVEY §4).  With ``check_agreement`` the
    transcript digest is cross-checked across processes via a collective.
    """
    from stark_tpu.stark.prover import prove

    mesh = global_mesh(backend)
    proof = prove(cfg, a1=a1, mesh=mesh)
    if check_agreement and jax.process_count() > 1:
        check_transcript_agreement(proof.proof)
    return proof


def check_transcript_agreement(proof_messages) -> None:
    """Cross-host failure detection (SURVEY §5.3): allgather a 4-byte
    transcript digest across processes and raise on divergence.

    Deterministic proving means any divergence is a real fault (corrupted
    host state, nondeterministic kernel, bad resume) — surface it loudly
    instead of emitting per-host-different proofs."""
    import hashlib

    import numpy as np
    from jax.experimental import multihost_utils

    digest = hashlib.sha256(b"".join(proof_messages)).digest()[:4]
    local = np.uint32(int.from_bytes(digest, "big"))
    gathered = np.asarray(multihost_utils.process_allgather(local))
    if not np.all(gathered == gathered[0]):
        raise RuntimeError(
            "transcript divergence across hosts: "
            f"digests {[hex(int(g)) for g in gathered]}"
        )
