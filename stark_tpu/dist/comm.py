"""Communication accounting + scaling projection (SURVEY §5.7-5.8).

The reference has no distributed story at all (rayon threads only,
reference: src/polynomial/interpolation.rs:80-115); the BASELINE north
star demands scaling-efficiency reporting at 1 chip / 1 host / N hosts.
Real multi-chip hardware is not reachable from this environment, so this
module provides the two halves a pod run plugs into:

* **Analytic accounting** — exact wire-byte counts per collective for
  each distributed component (four-step NTT all-to-alls, Merkle digest
  gather, FRI fold exchanges, FRI tail gather), derived from the shard
  layout, not measured.
* **HLO cross-check** — lower the actual sharded computation for a mesh
  and count the collectives XLA inserted, with their per-partition byte
  volumes, from the compiled HLO.  Tests assert the analytic model and
  the compiler agree (this also pins the FRI fold re-shard schedule
  explicitly instead of trusting GSPMD silently).
* **Scaling projection** — a roofline-style model (HBM bytes / chip
  bandwidth + wire bytes / ICI bandwidth) emitting the efficiency table
  (``benches/scaling.json``) that a real pod run can validate.
"""

from __future__ import annotations

import dataclasses
import json
import re

# TPU v5e (v5 lite) public figures; override per platform as needed.
HBM_GBPS = 819.0       # HBM bandwidth per chip, GB/s
ICI_GBPS = 186.0       # aggregate one-way ICI bandwidth per chip, GB/s
DCN_GBPS = 25.0        # per-host data-center network, GB/s

_ELEM = 4              # uint32 field element
_DIGEST = 32           # SHA-256 digest


@dataclasses.dataclass
class CollectiveVolume:
    """Wire bytes for one logical collective, totals across the mesh."""

    name: str            # e.g. "ntt/all_to_all[0]"
    kind: str            # all_to_all | all_gather | permute
    wire_bytes: int      # bytes crossing chip boundaries, summed over chips
    per_chip_bytes: int  # bytes sent by one chip

    def as_dict(self):
        return dataclasses.asdict(self)


# -- analytic models ---------------------------------------------------------
def ntt_collectives(n: int, s: int) -> list[CollectiveVolume]:
    """Four-step distributed NTT (dist/ntt.py): three tiled all_to_all
    transposes over the full (n,) array.  In a tiled all_to_all each chip
    keeps 1/s of its local block and sends the rest."""
    if s <= 1:
        return []
    per_chip = (n // s) * _ELEM * (s - 1) // s
    return [
        CollectiveVolume(f"ntt/all_to_all[{i}]", "all_to_all",
                         per_chip * s, per_chip)
        for i in range(3)
    ]


def merkle_collectives(n_leaves: int, s: int) -> list[CollectiveVolume]:
    """Sharded Merkle build (dist/merkle.py): subtrees are communication-
    free; the (s, 8)-word subtree-root array is all-gathered (replicated)
    for the top log2(s) levels."""
    if s <= 1:
        return []
    per_chip = _DIGEST * (s - 1)  # receives every other chip's root
    return [CollectiveVolume("merkle/root_gather", "all_gather",
                             per_chip * s, per_chip)]


def fri_fold_schedule(n: int, s: int, num_folds: int,
                      min_sharded: int | None = None) -> list[dict]:
    """The explicit FRI re-shard schedule (SURVEY §5.7).

    Layer k has size n/2^k.  Folding pairs element i with i + size/2:
    under contiguous sharding the entire upper half moves (chips d and
    d + s/2 exchange), so a sharded fold costs size/2 elements of wire
    traffic.  Once the layer no longer spans all chips usefully
    (size < min_sharded, default 8*s), the schedule gathers the tail to
    every chip once and folds replicated (zero further wire traffic).
    """
    if min_sharded is None:
        min_sharded = 8 * s
    sched = []
    size = n
    gathered = s <= 1
    for k in range(num_folds):
        if not gathered and size < min_sharded:
            sched.append({"layer": k, "size": size, "op": "gather_tail",
                          "wire_bytes": size * _ELEM * (s - 1)})
            gathered = True
        wire = 0 if gathered else (size // 2) * _ELEM
        sched.append({"layer": k, "size": size,
                      "op": "fold_sharded" if not gathered else "fold_local",
                      "wire_bytes": wire})
        size //= 2
    return sched


def fri_collectives(n: int, s: int, num_folds: int) -> list[CollectiveVolume]:
    out = []
    for step in fri_fold_schedule(n, s, num_folds):
        if step["wire_bytes"]:
            kind = "all_gather" if step["op"] == "gather_tail" else "permute"
            out.append(CollectiveVolume(
                f"fri/{step['op']}[{step['layer']}]", kind,
                step["wire_bytes"], step["wire_bytes"] // max(s, 1)))
    return out


def prove_collectives(log2_trace: int, blowup: int, s: int,
                      num_folds: int | None = None) -> list[CollectiveVolume]:
    """All collectives in one sharded prove (trace LDE + composition LDE
    NTTs, two Merkle builds + per-FRI-layer builds, FRI folds)."""
    n = 1 << log2_trace
    big = n * blowup
    if num_folds is None:
        num_folds = max(big.bit_length() - 4, 0)
    out = []
    # LDE = INTT(n) + NTT(big) for trace and composition each
    for tag, size in (("trace_intt", n), ("trace_ntt", big),
                      ("comp_intt", n), ("comp_ntt", big)):
        for c in ntt_collectives(size, s):
            out.append(dataclasses.replace(c, name=f"{tag}/{c.name}"))
    out += merkle_collectives(big, s)          # trace tree
    out += merkle_collectives(big, s)          # cp tree
    size = big
    for k in range(num_folds):
        size //= 2
        out += [dataclasses.replace(c, name=f"layer{k}/{c.name}")
                for c in merkle_collectives(size, s)]
    out += fri_collectives(big, s, num_folds)
    return out


# -- HLO cross-check ---------------------------------------------------------
_COLLECTIVE_RE = re.compile(
    r"\b(all-to-all|all-gather|collective-permute|all-reduce|"
    r"reduce-scatter)(?:-start)?\b"
    r".*?=\s*\(?[a-z0-9]+\[([0-9,]*)\]"
)
_OP_SHAPE_RE = re.compile(
    r"=\s*\(?\s*(?:[a-z][a-z0-9]*\[[0-9,]*\][,\s]*)*"
)


_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
_WIDTH = {"u32": 4, "s32": 4, "f32": 4, "u64": 8, "s64": 8, "f64": 8,
          "u16": 2, "s16": 2, "bf16": 2, "u8": 1, "s8": 1, "pred": 1}


def hlo_collectives(lowered_text: str) -> list[dict]:
    """Extract collective ops + per-partition byte counts from compiled
    HLO text (``jit(...).lower(...).compile().as_text()``).

    Handles both array-form results (``u32[512] all-to-all(...)``) and
    tuple-form (``(u32[8,8], ..., u32[8,8]) all-to-all(op0, ..., op7)``,
    XLA:CPU's lowering) — a tuple result's per-partition volume is the sum
    over its elements.
    """
    out = []
    for line in lowered_text.splitlines():
        line = re.sub(r"/\*.*?\*/", "", line).strip()
        m = re.search(
            r"=\s*(\(?[^=]*?)\s*\b(all-to-all|all-gather|collective-permute|"
            r"all-reduce|reduce-scatter)(?:-start)?\(", line)
        if not m:
            continue
        result_s, kind = m.groups()
        shapes = _SHAPE_RE.findall(result_s)
        if not shapes:
            continue
        total = 0
        dims0 = None
        for dtype, shape_s in shapes:
            dims = [int(d) for d in shape_s.split(",") if d] or [1]
            if dims0 is None:
                dims0 = dims
            elems = 1
            for d in dims:
                elems *= d
            total += elems * _WIDTH.get(dtype, 4)
        out.append({"kind": kind, "dtype": shapes[0][0], "shape": dims0,
                    "tuple_arity": len(shapes),
                    "bytes_per_partition": total})
    return out


def count_hlo_kinds(lowered_text: str) -> dict:
    counts: dict[str, int] = {}
    for c in hlo_collectives(lowered_text):
        counts[c["kind"]] = counts.get(c["kind"], 0) + 1
    return counts


# -- scaling projection ------------------------------------------------------
def _phase_model(log2_trace: int, blowup: int, s: int,
                 hbm_gbps: float, wire_gbps: float) -> dict:
    """Roofline time model for one prove at the given sharding."""
    n = 1 << log2_trace
    big = n * blowup
    num_folds = max(big.bit_length() - 4, 0)
    # HBM bytes touched per phase (reads+writes, evaluation-form pipeline;
    # NTT via fused four-step ~6 passes, Merkle ~2 passes + digest levels)
    ntt_bytes = 4 * (6 * _ELEM * (n + big))            # 2 LDEs (trace+comp)
    merkle_leaves = 2 * big + sum(big >> (k + 1) for k in range(num_folds))
    merkle_bytes = merkle_leaves * (_ELEM + 2 * _DIGEST)
    fri_bytes = sum((big >> k) * _ELEM * 3 for k in range(num_folds))
    compute_bytes = ntt_bytes + merkle_bytes + fri_bytes
    wire_bytes = sum(c.wire_bytes for c in
                     prove_collectives(log2_trace, blowup, s, num_folds))
    t_compute = compute_bytes / s / (hbm_gbps * 1e9)
    t_wire = (wire_bytes / max(s, 1)) / (wire_gbps * 1e9) if s > 1 else 0.0
    return {"devices": s, "compute_bytes": compute_bytes,
            "wire_bytes": wire_bytes,
            "t_model_s": t_compute + t_wire,
            "t_compute_s": t_compute, "t_wire_s": t_wire}


def scaling_report(log2_trace: int = 20, blowup: int = 8,
                   device_counts=(1, 2, 4, 8, 16, 32),
                   hbm_gbps: float = HBM_GBPS,
                   ici_gbps: float = ICI_GBPS) -> dict:
    """Projected scaling-efficiency table (BASELINE north star: >=80% to
    2 hosts).  Efficiency(s) = T(1) / (s * T(s))."""
    rows = [_phase_model(log2_trace, blowup, s, hbm_gbps, ici_gbps)
            for s in device_counts]
    t1 = rows[0]["t_model_s"]
    for r in rows:
        r["efficiency"] = t1 / (r["devices"] * r["t_model_s"])
    return {"log2_trace": log2_trace, "blowup": blowup,
            "hbm_gbps": hbm_gbps, "ici_gbps": ici_gbps, "rows": rows}


def write_scaling_report(path: str = "benches/scaling.json", **kw) -> dict:
    rep = scaling_report(**kw)
    with open(path, "w") as f:
        json.dump(rep, f, indent=1)
    return rep
