"""Declarative AIR builder — define a STARK statement once, run it
everywhere.

The hand-written AIRs in ``stark_tpu.stark.air`` each implement four
mirrors of the same constraint system by hand: a device trace generator,
a fused device composer, a host scalar composition mirror for the
verifier (``cp_at``), and the degree bookkeeping (``num_folds``).  The
reference never got this far (its ``src/trace/``, ``src/composition/``
and ``src/prover/`` are 0-byte stubs, SURVEY §2) — a real framework
needs user-definable statements without that 4x duplication.

Here a statement is ONE description — columns, a step recurrence,
boundary conditions, optional explicit transition constraints — written
against an abstract field-ops handle ``f``.  The same constraint
function is then evaluated under three adapters:

* the batched device field (``fields.fp.Fp``) over LDE arrays, with row
  shifts realised as cyclic rolls — the fused jitted composer;
* a scalar host field (plain python ints mod p) over per-query opened
  values — the verifier's ``cp_at`` mirror;
* a degree semiring (add = max, mul = sum, const = 0) — exact
  composition-degree inference, from which the FRI fold count and the
  minimum blowup are derived instead of hand-computed.

Example — the two-column multiplicative Fibonacci as a one-liner spec
(byte-identical transcripts to the hand-written ``FibMulAIR``, see
tests/test_air_builder.py)::

    fibmul = AirSpec(
        name="fibmul-decl",
        columns=2,
        init=((("input", 1), ("b0", 2718281)),),   # one window row: (a0, b0)
        step=lambda f, rows, P: (rows[0][1], f.mul(rows[0][0], rows[0][1])),
        boundaries=(
            Boundary(column=0, row=0, public="input"),
            Boundary(column=1, row=0, public="b0"),
            Boundary(column=1, row=-1, public="output"),
        ),
    )
    proof = prove(cfg, air=fibmul())            # bind default witness
    assert verify(proof)                        # spec auto-registered

When ``transitions`` is omitted it is derived from ``step``: one
constraint per column, ``rows[w][c] - step(rows[:w])[c]`` — the
recurrence IS the transition system.  Pass an explicit ``transitions``
for constraints that are not a deterministic recurrence.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.config import ProverConfig
from stark_tpu.fields.fp import Fp
from stark_tpu.stark.air import AIR, _BaseContext, _alphas_arr


# ---------------------------------------------------------------------------
# Field-ops adapters (the device adapter is fields.fp.Fp itself)
# ---------------------------------------------------------------------------
class ScalarField:
    """Host mod-p integers behind the same ops surface as ``Fp`` — the
    verifier-side constraint evaluation (cheap, per opened query)."""

    __slots__ = ("p",)

    def __init__(self, p: int):
        self.p = p

    def const(self, v: int) -> int:
        return v % self.p

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return a * b % self.p

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError("inverse of zero")
        return pow(a, self.p - 2, self.p)


class DegreeField:
    """Degree semiring: values are polynomial degrees in units of the
    trace-interpolant degree (a trace cell = 1, a constant = 0); mul
    adds, add/sub take the max.  Evaluating the transition constraints
    under this adapter yields their exact composition degree."""

    def const(self, v) -> int:
        return 0

    def add(self, a: int, b: int) -> int:
        return max(a, b)

    sub = add

    def mul(self, a: int, b: int) -> int:
        return a + b


# ---------------------------------------------------------------------------
# Spec dataclasses
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Boundary:
    """column value at trace row ``row`` (negative = from the end)
    equals the public input named ``public``."""

    column: int
    row: int
    public: str


def _as_tuple(x):
    return x if isinstance(x, tuple) else (x,)


class AirSpec(AIR):
    """A declaratively-defined AIR.  See module docstring.

    Parameters
    ----------
    name:        registry key (proofs carry it; ``verify`` reconstructs
                 the spec through it — specs self-register on creation).
    columns:     number of trace columns C.
    init:        window of the first ``w`` trace rows, each row a tuple
                 of C entries; an entry is an int (fixed), or a
                 ``(witness_name, default)`` pair bindable per instance
                 via ``spec(witness_name=...)``.
    step:        ``step(f, rows, params) -> tuple[C]`` — row ``i+w``
                 from the window ``rows[0..w-1]`` (``rows[k][c]`` =
                 column c at row i+k).  Drives trace generation AND (by
                 default) the transition constraints.
    boundaries:  Boundary constraints; exactly one must bind the public
                 ``"input"`` and one ``"output"`` (the proof's canonical
                 statement fields).
    transitions: optional ``fn(f, rows, params) -> tuple`` of constraint
                 expressions over the shift window (``rows[k]`` = shift
                 ``shifts[k]``); default: derived from ``step``.
    shifts:      row shifts the constraints read; default ``(0..w)``.
    params:      public parameters (name -> default int) available to
                 ``step``/``transitions`` as the ``P`` dict and carried
                 in the proof publics (e.g. a round constant).
    periodic:    name -> cycle of ints (power-of-two length L).  The
                 value at base row i is ``cycle[i mod L]``, available to
                 ``step``/``transitions`` through the same ``P`` dict.
                 Constraint-side it is the low-degree interpolant
                 K(x) = K_hat(x^(N/L)) (deg K = (L-1)·N/L < N-1, so it
                 adds at most one trace-unit of composition degree):
                 evaluated over the coset as ``blowup*L`` host-built
                 points tiled across the domain — zero XLA compile cost
                 — and as a scalar Horner in the verifier mirror.  This
                 is the standard STARK periodic-column mechanism for
                 round-constant schedules (MiMC/Rescue/Poseidon-style),
                 which fixed per-proof ``params`` cannot express.
    """

    def __init__(
        self,
        name: str,
        columns: int,
        init: Sequence[Sequence],
        step: Callable,
        boundaries: Sequence[Boundary],
        transitions: Callable | None = None,
        shifts: Sequence[int] | None = None,
        params: dict | None = None,
        periodic: dict | None = None,
        register: bool = True,
    ):
        self.name = name
        self.num_columns = int(columns)
        self.init = tuple(tuple(row) for row in init)
        self.step = step
        self.boundaries = tuple(boundaries)
        self.params_spec = dict(params or {})
        self.periodic = {
            k: tuple(int(v) for v in cyc) for k, cyc in (periodic or {}).items()
        }
        for k, cyc in self.periodic.items():
            L = len(cyc)
            if L < 1 or L & (L - 1):
                raise ValueError(
                    f"periodic {k!r}: cycle length must be a power of two, "
                    f"got {L}"
                )
        overlap = set(self.periodic) & set(self.params_spec)
        if overlap:
            raise ValueError(
                f"names bound as both param and periodic: {sorted(overlap)}"
            )
        self.window = len(self.init)
        if self.window < 1:
            raise ValueError("init must contain at least one window row")
        for row in self.init:
            if len(row) != self.num_columns:
                raise ValueError(
                    f"init rows must have {self.num_columns} entries"
                )
        self.shifts = (
            tuple(shifts) if shifts is not None
            else tuple(range(self.window + 1))
        )
        if self.shifts[0] != 0 or list(self.shifts) != sorted(set(self.shifts)):
            raise ValueError("shifts must be sorted, unique, starting at 0")
        if transitions is None:
            if self.shifts != tuple(range(self.window + 1)):
                raise ValueError(
                    "auto-derived transitions need shifts == (0..window)"
                )
            w = self.window

            def _auto(f, rows, P):
                nxt = _as_tuple(self.step(f, rows[:w], P))
                return tuple(
                    f.sub(rows[w][c], nxt[c]) for c in range(self.num_columns)
                )

            self.transitions = _auto
        else:
            self.transitions = lambda f, rows, P: _as_tuple(
                transitions(f, rows, P)
            )

        pubs = [b.public for b in self.boundaries]
        if len(set(pubs)) != len(pubs):
            raise ValueError("duplicate boundary public names")
        for required in ("input", "output"):
            if required not in pubs:
                raise ValueError(
                    f'boundaries must bind a public named "{required}"'
                )
        overlap = set(pubs) & (set(self.params_spec) | set(self.periodic))
        if overlap:
            raise ValueError(f"publics double-bound: {sorted(overlap)}")

        # degree inference (cfg-independent units): trace cell = 1; a
        # periodic interpolant has deg (L-1)·N/L <= N-2 for L <= N/2, so
        # one trace-unit is its exact ceiling
        df = DegreeField()
        deg_rows = tuple(
            tuple(1 for _ in range(self.num_columns)) for _ in self.shifts
        )
        deg_params = {k: 0 for k in self.params_spec}
        deg_params.update({k: 1 for k in self.periodic})
        self._trans_degrees = tuple(
            int(d) for d in self.transitions(df, deg_rows, deg_params)
        )
        if not self._trans_degrees:
            raise ValueError("at least one transition constraint required")
        self.num_alphas = len(self.boundaries) + len(self._trans_degrees)

        # instance witness/params (defaults; bind via spec(**overrides))
        self._witness = {}
        for row in self.init:
            for entry in row:
                if isinstance(entry, tuple):
                    wname, default = entry
                    self._witness[wname] = int(default)
        self._param_values = dict(self.params_spec)

        if register:
            _REGISTRY[name] = self

    # -- instance binding ---------------------------------------------------
    def __call__(self, **overrides) -> "AirSpec":
        """A bound copy with witness/param values overridden by name."""
        import copy

        bound = copy.copy(self)
        bound._witness = dict(self._witness)
        bound._param_values = dict(self._param_values)
        for k, v in overrides.items():
            if k in bound._witness:
                bound._witness[k] = int(v)
            elif k in bound._param_values:
                bound._param_values[k] = int(v)
            else:
                raise ValueError(f"unknown witness/param {k!r}")
        return bound

    def witness_params(self) -> dict:
        # rebuild_air re-binds through the registry: spec(**witness,
        # **params) — the spec's structure (step/transitions callables)
        # is NOT serialized, only the instance bindings
        return {"witness": dict(self._witness),
                "params": dict(self._param_values)}

    def _init_values(self) -> tuple:
        return tuple(
            tuple(
                self._witness[e[0]] if isinstance(e, tuple) else int(e)
                for e in row
            )
            for row in self.init
        )

    # -- AIR interface --------------------------------------------------
    def validate(self, cfg: ProverConfig) -> None:
        cfg.validate()
        folds = self.num_folds(cfg)
        if cfg.eval_domain_size >> folds < 2:
            need = 2 << folds >> cfg.log2_trace
            raise ValueError(
                f"{self.name}: composition degree needs blowup >= {need}"
            )
        T = cfg.trace_length
        for b in self.boundaries:
            r = b.row if b.row >= 0 else T + b.row
            if not 0 <= r < T:
                raise ValueError(f"boundary row {b.row} outside trace (T={T})")
        N = cfg.trace_domain_size
        for k, cyc in self.periodic.items():
            if len(cyc) > N // 2:
                raise ValueError(
                    f"periodic {k!r}: cycle length {len(cyc)} > N/2 = "
                    f"{N // 2} (the degree-1-unit ceiling needs L <= N/2)"
                )

    def num_folds(self, cfg: ProverConfig) -> int:
        T = cfg.trace_length
        w = max(self.shifts)
        # transition quotient degree: deg(expr) - deg(divisor), where the
        # divisor (x^N - 1) / prod(excluded) has degree N - (N - (T - w))
        # = T - w (transitions hold at rows 0 .. T-1-w)
        quot = max(u * (T - 1) - (T - w) for u in self._trans_degrees)
        quot = max(quot, T - 2)  # boundary quotients: (T-1) - 1
        return max(1, quot.bit_length())

    def build_trace(self, cfg: ProverConfig):
        fn = _spec_trace_jit(
            self, cfg.modulus, cfg.trace_length,
            tuple(sorted(self._param_values.items())),
        )
        return fn(
            self._device_init(cfg.modulus),
            _periodic_xs(self, cfg.modulus, cfg.trace_length),
        )

    def _device_init(self, p: int):
        f = Fp.get(p)
        return tuple(
            tuple(f.const(v) for v in row) for row in self._init_values()
        )

    def publics(self, trace) -> dict:
        T = int(trace.shape[-1])
        by_name = {
            b.public: _read_cell(
                trace, b.column, b.row if b.row >= 0 else T + b.row,
                self.num_columns,
            )
            for b in self.boundaries
        }
        out = {"input": by_name.pop("input"), "output": by_name.pop("output")}
        out.update(by_name)
        out.update(self._param_values)
        return out

    def context(self, cfg: ProverConfig):
        return _SpecContext(cfg, self)


def _horner(coeffs: list, x: int, p: int) -> int:
    """coeffs[0] + coeffs[1]·x + ... evaluated mod p (host ints)."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def _read_cell(trace, column: int, row: int, ncols: int) -> int:
    """Host int of trace[column, row] (width-generic, one tiny fetch;
    endpoint reads on host-generated traces answer from the host cache)."""
    from stark_tpu.stark.trace import host_endpoints

    T = int(trace.shape[-1])
    ends = host_endpoints(trace)
    if ends is not None and row in (0, T - 1):
        vec = np.asarray(ends[0] if row == 0 else ends[1]).reshape(-1)
        return int(vec[column] if ncols > 1 else vec[0])
    sub = trace[column] if ncols > 1 else trace
    sl = np.asarray(sub[..., row : row + 1]).astype(np.uint64).reshape(-1)
    if sub.ndim == 2:  # (2, T) limb planes
        return int(sl[0]) << 32 | int(sl[1])
    return int(sl[0])


_TRACE_JITS: dict = {}


def _periodic_xs(spec: AirSpec, p: int, T: int) -> dict:
    """Per-row periodic values as device arrays with the row axis
    leading (scan xs): (T,) for u32 fields, (T, 2) limb pairs for wide
    ones.  Host-built (numpy tile) — zero XLA compile."""
    f = Fp.get(p)
    out = {}
    for name, cyc in spec.periodic.items():
        L = len(cyc)
        vals = [cyc[t % L] for t in range(T)]
        arr = f.array(vals)  # (T,) or (2, T) limb-plane-leading
        out[name] = arr if arr.ndim == 1 else arr.T
    return out


def _spec_trace_jit(spec: AirSpec, p: int, T: int, params: tuple):
    """Jitted lax.scan trace generator for a spec (cached per
    (spec name, modulus, length, param values) — same key contract as the
    hand-written families' lru_cache)."""
    key = (spec.name, p, T, params)
    fn = _TRACE_JITS.get(key)
    if fn is not None:
        return fn
    f = Fp.get(p)
    C = spec.num_columns
    pdict = {k: f.const(v) for k, v in params}

    def gen(init_rows, periodic_xs):
        def body(carry, xv):
            # wide periodic xs arrive as (2,) rows; ops expect limb-first
            nxt = _as_tuple(spec.step(f, carry, {**pdict, **xv}))
            emit = carry[0][0] if C == 1 else jnp.stack(carry[0])
            return carry[1:] + (tuple(nxt),), emit

        _, out = jax.lax.scan(body, init_rows, periodic_xs, length=T)
        # scan stacks rows along axis 0; move the row axis last:
        # (T,) stays; (T, 2) -> (2, T); (T, C) -> (C, T);
        # (T, C, 2) -> (C, 2, T) — (col, limb, time), NOT a full .T
        return out if out.ndim == 1 else jnp.moveaxis(out, 0, -1)

    fn = jax.jit(gen)
    _TRACE_JITS[key] = fn
    return fn


class _SpecContext(_BaseContext):
    """Generic composer context: the device and host mirrors both come
    from the spec's single constraint description."""

    def __init__(self, cfg: ProverConfig, spec: AirSpec):
        super().__init__(cfg)
        p, g, N, T = cfg.modulus, self.g, self.N, cfg.trace_length
        self.spec = spec
        self.rows_abs = tuple(
            (b.row if b.row >= 0 else T + b.row) for b in spec.boundaries
        )
        self.binvs = tuple(
            self.boundary_inv(pow(g, r, p)) for r in self.rows_abs
        )
        w = max(spec.shifts)
        self.excluded = tuple(pow(g, i, p) for i in range(T - w, N))
        self.trans_mult = self.zerofier_inv_excluding(self.excluded)
        # periodic columns: K(x) = K_hat(x^(N/L)) with K_hat the INTT of
        # the cycle over the size-L subgroup.  Over the evaluation coset
        # {off·W^j} the argument x^(N/L) cycles with period blowup·L, so
        # K over the whole domain is blowup·L host-built points tiled
        # M/(blowup·L) times (device tile is fused into the composer).
        from stark_tpu.ntt.reference_ntt import root_of_unity

        self._periodic_names = tuple(sorted(spec.periodic))
        self._periodic_coeffs = {}
        small = []
        self._periodic_reps = []
        blowup = cfg.blowup
        for name in self._periodic_names:
            cyc = [v % p for v in spec.periodic[name]]
            L = len(cyc)
            hinv = pow(root_of_unity(p, L), p - 2, p)
            linv = pow(L, p - 2, p)
            coeffs = [
                linv * sum(
                    cyc[i] * pow(hinv, i * m, p) for i in range(L)
                ) % p
                for m in range(L)
            ]
            self._periodic_coeffs[name] = coeffs
            bl = blowup * L
            wb = root_of_unity(p, bl)
            off = pow(cfg.offset, N // L, p)
            pts = [off * pow(wb, j, p) % p for j in range(bl)]
            evals = [_horner(coeffs, x, p) for x in pts]
            small.append(self.fp.array(evals))  # (bl,) or (2, bl)
            self._periodic_reps.append(self.M // bl)
        self.periodic_small = tuple(small)
        from stark_tpu.utils.progcache import cached_jit, fn_digest

        # the compose program's identity: everything the traced HLO can
        # depend on beyond (cfg, class) — spec structure AND the actual
        # constraint bytecode (specs are user code; a name is not enough)
        self._spec_key = (
            spec.name, spec.num_columns, tuple(spec.shifts),
            tuple((b.column, b.row, b.public) for b in spec.boundaries),
            tuple(sorted(spec.params_spec.items())),
            tuple(sorted(spec.periodic.items())),
            fn_digest(spec.step), fn_digest(spec.transitions),
        )

        self._jit = cached_jit(
            self._compose_tables, "compose",
            (type(self).__name__, cfg.modulus, cfg.log2_trace,
             cfg.blowup, getattr(self, '_spec_key', None)))

    def _compose_tables(self, lde, alphas, bvals, pvals, binvs, trans_mult,
                        periodic_small):
        f = self.fp
        spec = self.spec
        blw = self.cfg.blowup
        cols = (
            tuple(lde[c] for c in range(spec.num_columns))
            if spec.num_columns > 1
            else (lde,)
        )
        rows = tuple(
            tuple(
                col if s == 0 else jnp.roll(col, -s * blw, axis=-1)
                for col in cols
            )
            for s in spec.shifts
        )
        terms = [
            f.mul(f.sub(rows[0][b.column], bv), bi)
            for b, bv, bi in zip(spec.boundaries, bvals, binvs)
        ]
        pdict = dict(zip(sorted(spec.params_spec), pvals))
        for name, arr, reps in zip(
            self._periodic_names, periodic_small, self._periodic_reps
        ):
            pdict[name] = jnp.tile(arr, reps)  # trailing-axis tile
        terms += [
            f.mul(e, trans_mult) for e in spec.transitions(f, rows, pdict)
        ]
        acc = f.mul(alphas[0], terms[0])
        for al, t in zip(alphas[1:], terms[1:]):
            acc = f.add(acc, f.mul(al, t))
        return acc

    def compose_args(self, publics: dict) -> tuple:
        bvals = tuple(self._bc(publics[b.public]) for b in self.spec.boundaries)
        pvals = tuple(
            self._bc(publics[k]) for k in sorted(self.spec.params_spec)
        )
        return (bvals, pvals, self.binvs, self.trans_mult,
                self.periodic_small)

    def compose(self, lde, alphas, publics: dict):
        return self._jit(
            lde, _alphas_arr(alphas, self.fp.p), *self.compose_args(publics)
        )

    def cp_at(self, x: int, opened: list, alphas, publics: dict) -> int:
        p = self.fp.p
        spec = self.spec
        f = ScalarField(p)
        g, N = self.g, self.N
        rows = tuple(
            (v,) if not isinstance(v, (tuple, list)) else tuple(v)
            for v in opened
        )
        terms = [
            (rows[0][b.column] - publics[b.public])
            * f.inv((x - pow(g, r, p)) % p)
            % p
            for b, r in zip(spec.boundaries, self.rows_abs)
        ]
        excl = 1
        for e in self.excluded:
            excl = excl * (x - e) % p
        tm = excl * f.inv((pow(x, N, p) - 1) % p) % p
        pdict = {k: publics[k] % p for k in spec.params_spec}
        for name, coeffs in self._periodic_coeffs.items():
            pdict[name] = _horner(coeffs, pow(x, N // len(coeffs), p), p)
        terms += [e * tm % p for e in spec.transitions(f, rows, pdict)]
        return sum(a * t % p for a, t in zip(alphas, terms)) % p


# ---------------------------------------------------------------------------
# Registry (verify() reconstructs specs by proof.air_name through here)
# ---------------------------------------------------------------------------
_REGISTRY: dict[str, AirSpec] = {}


def lookup_spec(name: str) -> AirSpec | None:
    return _REGISTRY.get(name)


def register_spec(spec: AirSpec) -> AirSpec:
    _REGISTRY[spec.name] = spec
    return spec
