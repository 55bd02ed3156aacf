"""Structured per-phase metrics (SURVEY §5.5).

The reference's only metrics are ``proof_size``/``compressed_proof_size``
(channel.rs:87-95) plus Criterion statistics.  Here every prove emits a
structured record — wall time, bytes, and op counts per phase — as JSON,
feeding the BASELINE metrics and regression comparison
(stark_tpu.utils.regression).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class PhaseMetric:
    name: str
    wall_s: float = 0.0
    extra: dict = field(default_factory=dict)


@dataclass
class MetricsCollector:
    phases: list[PhaseMetric] = field(default_factory=list)
    counters: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, **extra):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases.append(
                PhaseMetric(name, time.perf_counter() - t0, dict(extra))
            )

    def count(self, name: str, value=1):
        self.counters[name] = self.counters.get(name, 0) + value

    def to_dict(self) -> dict:
        return {
            "phases": [
                {"name": p.name, "wall_s": round(p.wall_s, 6), **p.extra}
                for p in self.phases
            ],
            "counters": dict(self.counters),
            "total_wall_s": round(sum(p.wall_s for p in self.phases), 6),
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())


# process-global collector used by prove() when none is passed.  Phases
# recorded here do NOT force device syncs (zero overhead, so wall times
# attribute async dispatch to the next blocking phase); pass an explicit
# collector to prove(metrics=...) for an accurate per-phase split (it
# block_until_ready's each phase's outputs).
GLOBAL = MetricsCollector()
