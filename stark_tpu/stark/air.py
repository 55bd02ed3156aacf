"""AIR (Algebraic Intermediate Representation) abstraction.

The reference hardcodes a single statement (Fibonacci-square, and only as
empty stubs — src/trace/, src/composition/, src/prover/ are 0 bytes).
Here the statement is a pluggable object; the prover/verifier pipeline
(trace -> LDE -> commit -> composition -> FRI -> queries) is generic over:

* how the trace is generated (``build_trace``),
* which row shifts the constraints read (``shifts`` — the openings per
  query and the cyclic LDE rolls),
* the pointwise composition on device (``Context.compose``) and its host
  mirror for the verifier (``Context.cp_at``),
* the composition degree bound (``num_folds`` — FRI folds until the
  claimed degree reaches 0).

Shipped AIRs:

* :class:`FibonacciSquareAIR` — STARK-101's a_{i+2} = a_{i+1}^2 + a_i^2
  (degree-2 transition, CP degree < N, log2(N) folds).
* :class:`MimcAIR` — the MiMC-style cube permutation
  x_{i+1} = (x_i + k)^3 (degree-3 transition, CP degree < 2N, so
  log2(N)+1 folds and blowup >= 4 — exercising the framework paths a
  second constraint family needs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.config import ProverConfig
from stark_tpu.fields.fp import Fp
from stark_tpu.ntt.reference_ntt import root_of_unity

_U32 = jnp.uint32


class AIR:
    """Base interface; see module docstring.  Subclasses are lightweight
    descriptors — heavy per-config state lives in their Context."""

    name: str = "abstract"
    shifts: tuple[int, ...] = (0,)
    num_alphas: int = 0
    num_columns: int = 1  # trace columns; >1 commits rows (from_columns)

    def build_trace(self, cfg: ProverConfig):
        raise NotImplementedError

    def publics(self, trace) -> dict:
        """Public statement extracted from the trace (host, tiny fetch)."""
        raise NotImplementedError

    def num_folds(self, cfg: ProverConfig) -> int:
        raise NotImplementedError

    def validate(self, cfg: ProverConfig) -> None:
        cfg.validate()

    def context(self, cfg: ProverConfig):
        raise NotImplementedError

    def witness_params(self) -> dict:
        """JSON-serializable instance data sufficient to rebuild this AIR
        via :func:`rebuild_air` — the checkpoint/resume identity
        (SURVEY §5.4; a checkpoint that cannot name its statement can
        only resume the default family)."""
        raise NotImplementedError


def rebuild_air(name: str, params: dict) -> AIR:
    """Reconstruct an AIR instance from (name, witness_params()) — the
    inverse used by checkpoint resume.  Legacy AIRs map name -> class;
    declarative AirSpecs resolve through the registry and re-bind their
    witness/param overrides."""
    legacy = {
        "fibonacci-square": FibonacciSquareAIR,
        "mimc3": MimcAIR,
        "fibmul": FibMulAIR,
    }
    if name in legacy:
        return legacy[name](**params)
    from stark_tpu.stark.air_builder import lookup_spec

    spec = lookup_spec(name)
    if spec is None:
        raise ValueError(
            f"unknown AIR {name!r}: not a legacy family and not in the "
            "spec registry (declarative specs must be registered before "
            "resume)"
        )
    return spec(**params.get("witness", {}), **params.get("params", {}))


def _alphas_arr(alphas, p: int):
    """Challenge tuple -> tuple of device field elements; accepts host
    ints or the device scalars a DeviceFS draw produces ((2,) limb pairs
    for 64-bit fields)."""
    f = Fp.get(p)
    return tuple(
        f.const(int(a)) if isinstance(a, (int, np.integer)) else a
        for a in alphas
    )


def _elem_int(trace, i: int) -> int:
    """Host int of trace element i (one tiny fetch), width-generic: the
    lane axis is last; a leading (2,) limb plane may precede it.  Traces
    uploaded from the native host generator answer endpoint reads (0/-1)
    from the host cache — no device round trip."""
    if i in (0, -1):
        from stark_tpu.stark.trace import host_endpoints

        ends = host_endpoints(trace)
        if ends is not None:
            return int(ends[0] if i == 0 else ends[1])
    sl = trace[..., i : i + 1] if i >= 0 else trace[..., i:]
    vals = np.asarray(sl).astype(np.uint64).reshape(-1)
    if trace.ndim == 2:
        return int(vals[0]) << 32 | int(vals[1])
    return int(vals[0])


@functools.lru_cache(maxsize=None)
def _boundary_inv_prog(p: int, m: int):
    """ONE compiled 1/(x - point) program per (field, domain size): the
    point is an argument, the Fermat chain is the rolled fori_loop — so
    every boundary point of every AIR at this size shares a compile.

    Plain jax.jit on purpose: the rolled program is tiny (tracing is
    ~ms, the XLA persistent cache covers the compile), and the export
    path would COMMIT the outputs to a device — the sharded prove needs
    these tables uncommitted so they replicate against sharded operands.
    """
    f = Fp.get(p)

    def run(domain, point):
        return f.inv_rolled(f.sub(domain, point))

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _zerofier_inv_prog(p: int, m: int, n: int, count: int):
    """prod(x - excl[i]) / (x^n - 1) with excluded points as arguments;
    program keyed on (field, domain, trace size, #excluded) only.
    Plain jit, uncommitted outputs — see _boundary_inv_prog."""
    f = Fp.get(p)

    def run(domain, excl):
        one = f.const(1)
        if f.width > 1:
            one = one[:, None]
        xn = f.pow_static(domain, n)
        mult = f.inv_rolled(f.sub(xn, one))
        for i in range(count):
            e = excl[..., i:i + 1] if f.width > 1 else excl[i]
            mult = f.mul(mult, f.sub(domain, e))
        return mult

    return jax.jit(run)


class _BaseContext:
    """Shared per-config tables: the LDE coset domain and x^N - 1
    inverses (every AIR's quotients need them)."""

    def __init__(self, cfg: ProverConfig):
        cfg.validate()
        p = cfg.modulus
        f = Fp.get(p)
        self.cfg = cfg
        self.fp = f
        self.N = cfg.trace_domain_size
        self.M = cfg.eval_domain_size
        self.g = root_of_unity(p, self.N)
        self.w = root_of_unity(p, self.M)
        self.domain = f.jit_coset_domain(cfg.offset, self.w, self.M)

    def _bc(self, value: int):
        """Broadcastable canonical constant (scalar, or (2, 1) pair)."""
        c = self.fp.const(value)
        return c[:, None] if self.fp.width > 1 else c

    def boundary_inv(self, point: int):
        """1 / (x - point) on the LDE domain.

        The point rides as an ARGUMENT so one compiled program per
        (p, M) serves every boundary point of every AIR; the inverse is
        the rolled fori_loop chain — together they turn context setup
        from the dominant wide-field compile cost (a fresh ~30k-op
        unrolled-Fermat program per point, ~40 s ctx build at 2^12
        Goldilocks) into a sub-second cached call (probe r5)."""
        return _boundary_inv_prog(self.fp.p, self.M)(
            self.domain, self._bc(point))

    def zerofier_inv_excluding(self, excluded: tuple[int, ...]):
        """prod(x - e for e in excluded) / (x^N - 1) on the LDE domain —
        the transition-constraint multiplier.  Excluded points are
        arguments; the program is keyed on (p, M, N, count) only."""
        f = self.fp
        if f.width > 1:
            stacked = f.array(list(excluded))  # (2, k)
        else:
            stacked = jnp.asarray([int(e) % f.p for e in excluded],
                                  dtype=jnp.uint32)
        return _zerofier_inv_prog(f.p, self.M, self.N,
                                  len(excluded))(self.domain, stacked)


# ---------------------------------------------------------------------------
# Fibonacci-square (STARK-101)
# ---------------------------------------------------------------------------
class FibonacciSquareAIR(AIR):
    """a_{i+2} = a_{i+1}^2 + a_i^2; publics a_0 and a_{T-1}.  Constraint
    layout exactly as STARK-101 (see stark_tpu.stark.composition)."""

    name = "fibonacci-square"
    shifts = (0, 1, 2)
    num_alphas = 3

    def __init__(self, a1: int = 3141592, a0: int = 1):
        self.a0 = a0
        self.a1 = a1

    def build_trace(self, cfg: ProverConfig):
        from stark_tpu.stark.trace import fibonacci_square_trace

        return fibonacci_square_trace(cfg.modulus, cfg.trace_length, self.a0, self.a1)

    def publics(self, trace) -> dict:
        return {
            "a0": _elem_int(trace, 0),
            "a_last": _elem_int(trace, -1),
        }

    def witness_params(self) -> dict:
        return {"a1": self.a1, "a0": self.a0}

    def num_folds(self, cfg: ProverConfig) -> int:
        return cfg.log2_trace  # CP degree < N

    def context(self, cfg: ProverConfig):
        return _FibContext(cfg)


class _FibContext(_BaseContext):
    def __init__(self, cfg: ProverConfig):
        super().__init__(cfg)
        p = cfg.modulus
        g, N = self.g, self.N
        self.inv_b0 = self.boundary_inv(1)
        self.inv_b1 = self.boundary_inv(pow(g, N - 2, p))
        self.trans_mult = self.zerofier_inv_excluding(
            (pow(g, N - 3, p), pow(g, N - 2, p), pow(g, N - 1, p))
        )
        # tables are jit ARGUMENTS, never closure captures — captured
        # device arrays are inlined into the HLO as literals, and at
        # 2^25-point domains that is hundreds of MB of serialized program
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(
            self._compose_tables, "compose",
            (type(self).__name__, cfg.modulus, cfg.log2_trace,
             cfg.blowup, getattr(self, '_spec_key', None)))

    def _compose_tables(self, lde, alphas, a0, a_last, inv_b0, inv_b1,
                        trans_mult):
        f = self.fp
        b = self.cfg.blowup
        f_x = lde
        f_gx = jnp.roll(lde, -b, axis=-1)
        f_g2x = jnp.roll(lde, -2 * b, axis=-1)
        p0 = f.mul(f.sub(f_x, a0), inv_b0)
        p1 = f.mul(f.sub(f_x, a_last), inv_b1)
        num = f.sub(f.sub(f_g2x, f.mul(f_gx, f_gx)), f.mul(f_x, f_x))
        p2 = f.mul(num, trans_mult)
        return f.add(
            f.add(f.mul(alphas[0], p0), f.mul(alphas[1], p1)),
            f.mul(alphas[2], p2),
        )

    def _compose(self, lde, alphas, a0, a_last):
        return self._compose_tables(lde, alphas, a0, a_last, self.inv_b0,
                                    self.inv_b1, self.trans_mult)

    def compose_args(self, publics: dict) -> tuple:
        """Everything _compose_tables needs after (lde, alphas) — the
        uniform surface the single-dispatch prove fuses through
        (stark/prover._mega_fn); compose() is the standalone jit of the
        same call."""
        return (self._bc(publics["a0"]), self._bc(publics["a_last"]),
                self.inv_b0, self.inv_b1, self.trans_mult)

    def compose(self, lde, alphas, publics: dict):
        return self._jit(lde, _alphas_arr(alphas, self.fp.p),
                         *self.compose_args(publics))

    def cp_at(self, x: int, opened: list[int], alphas, publics: dict) -> int:
        p = self.fp.p
        N, g = self.N, self.g
        fx, fgx, fg2x = opened
        a0, a_last = publics["a0"], publics["a_last"]
        p0 = (fx - a0) * pow((x - 1) % p, p - 2, p) % p
        p1 = (fx - a_last) * pow((x - pow(g, N - 2, p)) % p, p - 2, p) % p
        num = (fg2x - fgx * fgx - fx * fx) % p
        cubic = (
            (x - pow(g, N - 3, p)) * (x - pow(g, N - 2, p)) * (x - pow(g, N - 1, p))
        ) % p
        zn_inv = pow((pow(x, N, p) - 1) % p, p - 2, p)
        p2 = num * cubic * zn_inv % p
        return (alphas[0] * p0 + alphas[1] * p1 + alphas[2] * p2) % p


# ---------------------------------------------------------------------------
# MiMC cube chain
# ---------------------------------------------------------------------------
class MimcAIR(AIR):
    """x_{i+1} = (x_i + k)^3 over GF(p); publics x_0 (input) and x_{T-1}
    (output), round key k public.

    Transition degree 3 => CP degree < 2N: one extra FRI fold and
    blowup >= 4 required (enforced in validate)."""

    name = "mimc3"
    shifts = (0, 1)
    num_alphas = 3

    def __init__(self, x0: int = 271828, k: int = 777):
        self.x0 = x0
        self.k = k

    def validate(self, cfg: ProverConfig) -> None:
        cfg.validate()
        if cfg.blowup < 4:
            raise ValueError("MimcAIR needs blowup >= 4 (CP degree < 2N)")

    def build_trace(self, cfg: ProverConfig):
        from stark_tpu.stark.trace import host_or_device_trace

        p = cfg.modulus
        return host_or_device_trace(
            "mimc", p, self.x0, self.k, cfg.trace_length,
            lambda: _mimc_trace_jit(p, cfg.trace_length, self.k)(
                Fp.get(p).const(self.x0)))

    def publics(self, trace) -> dict:
        return {
            "input": _elem_int(trace, 0),
            "output": _elem_int(trace, -1),
            "k": self.k,
        }

    def witness_params(self) -> dict:
        return {"x0": self.x0, "k": self.k}

    def num_folds(self, cfg: ProverConfig) -> int:
        return cfg.log2_trace + 1  # CP degree < 2N

    def context(self, cfg: ProverConfig):
        return _MimcContext(cfg, self.k)


@functools.lru_cache(maxsize=None)
def _mimc_trace_jit(p: int, length: int, k: int):
    f = Fp.get(p)

    kc = f.const(k)

    def gen(x0):
        def step(x, _):
            t = f.add(x, kc)
            return f.mul(f.mul(t, t), t), x

        _, out = jax.lax.scan(step, x0, None, length=length)
        return out.T if f.width > 1 else out

    return jax.jit(gen)


class _MimcContext(_BaseContext):
    def __init__(self, cfg: ProverConfig, k: int):
        super().__init__(cfg)
        p = cfg.modulus
        g, N = self.g, self.N
        self.k = k
        self.inv_b0 = self.boundary_inv(1)
        self.inv_b1 = self.boundary_inv(pow(g, N - 2, p))
        # transition holds at g^0..g^{T-2}; excluded: g^{N-2}, g^{N-1}
        self.trans_mult = self.zerofier_inv_excluding(
            (pow(g, N - 2, p), pow(g, N - 1, p))
        )
        # k is baked into the traced program (self._bc(self.k) literal)
        self._spec_key = ("k", int(k))
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(
            self._compose_tables, "compose",
            (type(self).__name__, cfg.modulus, cfg.log2_trace,
             cfg.blowup, getattr(self, '_spec_key', None)))

    def _compose_tables(self, lde, alphas, x0, x_out, inv_b0, inv_b1,
                        trans_mult):
        f = self.fp
        b = self.cfg.blowup
        f_x = lde
        f_gx = jnp.roll(lde, -b, axis=-1)
        p0 = f.mul(f.sub(f_x, x0), inv_b0)
        p1 = f.mul(f.sub(f_x, x_out), inv_b1)
        t = f.add(f_x, self._bc(self.k))
        cube = f.mul(f.mul(t, t), t)
        num = f.sub(f_gx, cube)
        p2 = f.mul(num, trans_mult)
        return f.add(
            f.add(f.mul(alphas[0], p0), f.mul(alphas[1], p1)),
            f.mul(alphas[2], p2),
        )

    def _compose(self, lde, alphas, x0, x_out):
        return self._compose_tables(lde, alphas, x0, x_out, self.inv_b0,
                                    self.inv_b1, self.trans_mult)

    def compose_args(self, publics: dict) -> tuple:
        return (self._bc(publics["input"]), self._bc(publics["output"]),
                self.inv_b0, self.inv_b1, self.trans_mult)

    def compose(self, lde, alphas, publics: dict):
        return self._jit(lde, _alphas_arr(alphas, self.fp.p),
                         *self.compose_args(publics))

    def cp_at(self, x: int, opened: list[int], alphas, publics: dict) -> int:
        p = self.fp.p
        N, g = self.N, self.g
        fx, fgx = opened
        p0 = (fx - publics["input"]) * pow((x - 1) % p, p - 2, p) % p
        p1 = (fx - publics["output"]) * pow((x - pow(g, N - 2, p)) % p, p - 2, p) % p
        t = (fx + publics["k"]) % p
        num = (fgx - t * t % p * t) % p
        excl = (x - pow(g, N - 2, p)) * (x - pow(g, N - 1, p)) % p
        zn_inv = pow((pow(x, N, p) - 1) % p, p - 2, p)
        p2 = num * excl * zn_inv % p
        return (alphas[0] * p0 + alphas[1] * p1 + alphas[2] * p2) % p


# ---------------------------------------------------------------------------
REGISTRY: dict[str, type[AIR]] = {
    FibonacciSquareAIR.name: FibonacciSquareAIR,
    MimcAIR.name: MimcAIR,
}


# ---------------------------------------------------------------------------
# Two-column multiplicative Fibonacci — the multi-column family
# ---------------------------------------------------------------------------
class FibMulAIR(AIR):
    """a_{i+1} = b_i, b_{i+1} = a_i * b_i over GF(p), a TWO-column trace:
    exercises the multi-column pipeline (batched column INTT/NTT, row-leaf
    commitment MerkleTree.from_columns, per-row multi-value openings).

    Publics: input a_0, b_0, and the claimed output b_{T-1}.  Degree-2
    transition, CP degree < N => log2(N) folds like Fibonacci-square.
    The reference defines no multi-column layout (its trace/composition
    are 0-byte stubs); this family freezes ours under test."""

    name = "fibmul"
    shifts = (0, 1)
    num_alphas = 5
    num_columns = 2

    def __init__(self, a0: int = 1, b0: int = 2718281):
        self.a0 = a0
        self.b0 = b0

    def build_trace(self, cfg: ProverConfig):
        from stark_tpu.stark.trace import host_or_device_trace

        p = cfg.modulus
        f = Fp.get(p)
        return host_or_device_trace(
            "fibmul", p, self.a0, self.b0, cfg.trace_length,
            lambda: _fibmul_trace_jit(p, cfg.trace_length)(
                f.const(self.a0), f.const(self.b0)))

    def publics(self, trace) -> dict:
        from stark_tpu.stark.trace import host_endpoints

        ends = host_endpoints(trace)
        if ends is not None:
            first, last = ends  # (2,) per-column endpoints
            return {"input": int(first[0]), "output": int(last[1]),
                    "b0": int(first[1])}
        # device trace: (2, n) u32 or (2, 2, n) (col, limb, n) for 64-bit
        t0 = np.asarray(trace[..., :1]).reshape(trace.shape[:-1])
        tl = np.asarray(trace[..., -1:]).reshape(trace.shape[:-1])

        def val(arr, c):
            row = arr[c].reshape(-1)
            return (int(row[0]) << 32 | int(row[1])) if row.shape[0] == 2 \
                else int(row[0])

        return {"input": val(t0, 0), "output": val(tl, 1),
                "b0": val(t0, 1)}

    def witness_params(self) -> dict:
        return {"a0": self.a0, "b0": self.b0}

    def num_folds(self, cfg: ProverConfig) -> int:
        return cfg.log2_trace  # CP degree < N

    def context(self, cfg: ProverConfig):
        return _FibMulContext(cfg)


REGISTRY[FibMulAIR.name] = FibMulAIR


@functools.lru_cache(maxsize=None)
def _fibmul_trace_jit(p: int, length: int):
    f = Fp.get(p)

    def gen(a0, b0):
        def step(carry, _):
            a, b = carry
            return (b, f.mul(a, b)), jnp.stack([a, b])

        _, out = jax.lax.scan(step, (a0, b0), None, length=length)
        # (length, 2[, 2]) -> (2[, 2], length): (col, [limb,] time)
        return jnp.moveaxis(out, 0, -1)

    return jax.jit(gen)


class _FibMulContext(_BaseContext):
    def __init__(self, cfg: ProverConfig):
        super().__init__(cfg)
        p = cfg.modulus
        g, N = self.g, self.N
        self.inv_b0 = self.boundary_inv(1)
        self.inv_b1 = self.boundary_inv(pow(g, N - 2, p))
        # transition holds at g^0..g^{T-2}; excluded: g^{N-2}, g^{N-1}
        self.trans_mult = self.zerofier_inv_excluding(
            (pow(g, N - 2, p), pow(g, N - 1, p))
        )
        from stark_tpu.utils.progcache import cached_jit

        self._jit = cached_jit(
            self._compose_tables, "compose",
            (type(self).__name__, cfg.modulus, cfg.log2_trace,
             cfg.blowup, getattr(self, '_spec_key', None)))

    def _compose_tables(self, lde, alphas, a0, b0, b_last, inv_b0, inv_b1,
                        trans_mult):
        f = self.fp
        blw = self.cfg.blowup
        a_x, b_x = lde[0], lde[1]
        a_gx = jnp.roll(a_x, -blw, axis=-1)
        b_gx = jnp.roll(b_x, -blw, axis=-1)
        p0 = f.mul(f.sub(a_x, a0), inv_b0)
        p1 = f.mul(f.sub(b_x, b0), inv_b0)
        p2 = f.mul(f.sub(b_x, b_last), inv_b1)
        t1 = f.mul(f.sub(a_gx, b_x), trans_mult)
        t2 = f.mul(f.sub(b_gx, f.mul(a_x, b_x)), trans_mult)
        acc = f.mul(alphas[0], p0)
        for al, term in zip(alphas[1:], (p1, p2, t1, t2)):
            acc = f.add(acc, f.mul(al, term))
        return acc

    def compose_args(self, publics: dict) -> tuple:
        return (self._bc(publics["input"]), self._bc(publics["b0"]),
                self._bc(publics["output"]),
                self.inv_b0, self.inv_b1, self.trans_mult)

    def compose(self, lde, alphas, publics: dict):
        return self._jit(lde, _alphas_arr(alphas, self.fp.p),
                         *self.compose_args(publics))

    def cp_at(self, x: int, opened: list, alphas, publics: dict) -> int:
        p = self.fp.p
        N, g = self.N, self.g
        (ax, bx), (agx, bgx) = opened
        a0, b0, bl = publics["input"], publics["b0"], publics["output"]
        inv_x1 = pow((x - 1) % p, p - 2, p)
        p0 = (ax - a0) * inv_x1 % p
        p1 = (bx - b0) * inv_x1 % p
        p2 = (bx - bl) * pow((x - pow(g, N - 2, p)) % p, p - 2, p) % p
        quad = (x - pow(g, N - 2, p)) * (x - pow(g, N - 1, p)) % p
        tm = quad * pow((pow(x, N, p) - 1) % p, p - 2, p) % p
        t1 = (agx - bx) * tm % p
        t2 = (bgx - ax * bx) * tm % p
        return sum(al * t % p
                   for al, t in zip(alphas, (p0, p1, p2, t1, t2))) % p


def air_from_name(name: str, publics: dict) -> AIR:
    """Reconstruct a verifier-side AIR instance from a proof's statement."""
    import stark_tpu.stark.families  # noqa: F401  (registers shipped specs)
    from stark_tpu.stark.air_builder import lookup_spec

    spec = lookup_spec(name)
    if spec is not None:
        return spec
    if name == FibonacciSquareAIR.name:
        return FibonacciSquareAIR(a0=publics.get("a0", 1))
    if name == MimcAIR.name:
        return MimcAIR(x0=publics.get("input", 0), k=publics.get("k", 0))
    if name == FibMulAIR.name:
        return FibMulAIR(a0=publics.get("input", 1), b0=publics.get("b0", 1))
    raise ValueError(f"unknown AIR {name!r}")
