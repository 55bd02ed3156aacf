"""Checkpoint / resume / fault recovery (SURVEY §5.3-5.4).

The reference has none of this; the survey's prescription: the transcript
IS the serialized prover state — deterministic pure-functional proving
makes recovery "replay the log, verify the prefix, continue".

``prove_resumable`` wraps the normal prover with a ``ReplayChannel``:

* while the transcript cursor is inside the checkpointed prefix, every
  message the (re)computed pipeline produces is **asserted byte-equal**
  against the log — silent nondeterminism or data corruption after a
  restart is detected, not propagated (this is the failure-detection
  story: a resumed run that diverges raises ResumeMismatch immediately);
* past the prefix it behaves exactly like a fresh Channel;
* ``stop_after`` simulates a crash at a phase boundary and returns a
  serializable ProverCheckpoint.

Checkpoints carry the full statement identity — ``(config, air_name,
air_params)`` — so every family resumes: legacy AIRs rebuild from their
constructor params, declarative AirSpecs re-bind through the registry,
and Goldilocks/named-field proves are covered by the config's modulus
(round-3 verdict item 6: resume previously covered only the default
Fibonacci-square family).

Device state (LDE, trees, folds) is recomputed on resume — it is
deterministic and cheap relative to losing the Fiat-Shamir transcript,
and requires no device-array serialization (SURVEY §5.3: "recovery =
re-run" + phase-tagged transcript checkpoints).
"""

from __future__ import annotations

import dataclasses
import json

from stark_tpu.channel.channel import Channel
from stark_tpu.config import ProverConfig
from stark_tpu.stark.prover import StarkProof


class ProverInterrupted(Exception):
    """Raised internally by stop_after to unwind the prover."""

    def __init__(self, checkpoint: "ProverCheckpoint"):
        self.checkpoint = checkpoint


class ResumeMismatch(Exception):
    """The recomputed transcript diverged from the checkpointed prefix."""


@dataclasses.dataclass
class ProverCheckpoint:
    config: ProverConfig
    air_name: str
    air_params: dict
    phase: str
    proof: list[bytes]
    phases: list[tuple[str, int]]

    def serialize(self) -> bytes:
        c = self.config
        return json.dumps(
            {
                "config": {
                    "modulus": c.modulus, "generator": c.generator,
                    "log2_trace": c.log2_trace, "blowup": c.blowup,
                    "num_queries": c.num_queries,
                },
                "air": self.air_name,
                "air_params": self.air_params,
                "phase": self.phase,
                "proof": [m.hex() for m in self.proof],
                "phases": self.phases,
            }
        ).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "ProverCheckpoint":
        o = json.loads(data.decode())
        c = o["config"]
        return cls(
            config=ProverConfig(
                modulus=c["modulus"], generator=c["generator"],
                log2_trace=c["log2_trace"], blowup=c["blowup"],
                num_queries=c["num_queries"],
            ),
            air_name=o["air"],
            air_params=o["air_params"],
            phase=o["phase"],
            proof=[bytes.fromhex(m) for m in o["proof"]],
            phases=[tuple(p) for p in o["phases"]],
        )


class ReplayChannel(Channel):
    """Channel that verifies sends against a checkpointed prefix, and can
    interrupt itself at a phase boundary (crash simulation).

    `phase_accurate` keeps the prover on the per-phase replay path: the
    single-fetch fast path would run the ENTIRE prove on device before
    any mark_phase fires, so a stop_after checkpoint would save no device
    work (stark/prover.py gates on this attribute)."""

    phase_accurate = True

    def __init__(self, modulus: int, saved: list[bytes], stop_after: str | None,
                 cfg: ProverConfig, air_name: str, air_params: dict):
        super().__init__(modulus)
        self._saved = list(saved)
        self._stop_after = stop_after
        self._cfg = cfg
        self._air_name = air_name
        self._air_params = air_params

    def send(self, message: bytes) -> None:
        i = len(self.proof)
        if i < len(self._saved) and self._saved[i] != bytes(message):
            raise ResumeMismatch(
                f"recomputed message {i} differs from checkpoint "
                f"({bytes(message)[:16].hex()} != {self._saved[i][:16].hex()})"
            )
        super().send(message)

    def receive_random_int(self, min_, max_, show_in_proof=False):
        if show_in_proof:
            i = len(self.proof)
            num = super().receive_random_int(min_, max_, True)
            if i < len(self._saved) and self._saved[i] != self.proof[i]:
                raise ResumeMismatch(f"random draw {i} differs from checkpoint")
            return num
        return super().receive_random_int(min_, max_, False)

    def receive_random_field_element(self):
        i = len(self.proof)
        el = super().receive_random_field_element()
        if i < len(self._saved) and self._saved[i] != self.proof[i]:
            raise ResumeMismatch(f"field draw {i} differs from checkpoint")
        return el

    def mark_phase(self, label: str) -> None:
        # interrupt at the boundary AFTER completing the requested phase
        if self._stop_after is not None and self.phases and \
                self.phases[-1][0] == self._stop_after:
            raise ProverInterrupted(
                ProverCheckpoint(
                    self._cfg, self._air_name, self._air_params,
                    self._stop_after,
                    [bytes(m) for m in self.proof], list(self.phases),
                )
            )
        super().mark_phase(label)


def prove_resumable(
    cfg: ProverConfig,
    a1: int = 3141592,
    resume: ProverCheckpoint | None = None,
    stop_after: str | None = None,
    mesh=None,
    air=None,
):
    """Prove with crash/resume support, any statement family.

    Returns a StarkProof, or a ProverCheckpoint when `stop_after` names a
    phase ('trace-commit', 'composition', 'fri-commit', 'queries').
    With `resume`, the checkpointed transcript prefix is verified while
    the pipeline is deterministically recomputed, then proving continues.
    `air` selects the statement family exactly as in :func:`prove`; on
    resume it may be omitted — the checkpoint names its AIR and it is
    rebuilt (declarative specs must already be registered, which import
    of their defining module does).
    """
    from stark_tpu.stark.air import FibonacciSquareAIR, rebuild_air

    if air is None:
        if resume is not None and resume.air_name != "fibonacci-square":
            if a1 != 3141592:
                raise ValueError(
                    f"checkpoint is for {resume.air_name!r}; pass the "
                    "witness through air=, not a1="
                )
            air = rebuild_air(resume.air_name, resume.air_params)
        else:
            air = FibonacciSquareAIR(a1=a1)
    elif a1 != 3141592:
        raise ValueError("pass the witness through the AIR, not a1=")
    air_name, air_params = air.name, air.witness_params()
    if resume is not None:
        if resume.config != cfg:
            raise ValueError("checkpoint does not match config")
        if (resume.air_name, resume.air_params) != (air_name, air_params):
            raise ValueError("checkpoint does not match statement/witness")
        saved = resume.proof
    else:
        saved = []
    channel = ReplayChannel(cfg.modulus, saved, stop_after, cfg,
                            air_name, air_params)
    from stark_tpu.stark import prover as _prover

    try:
        return _prover.prove(cfg, a1=a1, mesh=mesh, channel=channel, air=air)
    except ProverInterrupted as e:
        return e.checkpoint
