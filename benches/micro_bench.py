"""Micro-benchmarks mirroring the reference's Criterion groups
(reference: benches/field_bench.rs, poly_ops.rs, poly_lang.rs) plus the
device-path equivalents, with criterion-style regression verdicts against
a stored baseline (stark_tpu.utils.regression).

Usage: python benches/micro_bench.py [--cpu] [--save-baseline]
Writes benches/micro_latest.json; compares against benches/micro_baseline.json.

Unlike the reference's field bench (constant operands that the compiler
folds to ~314 ps of pure harness overhead, BASELINE.md caveat), operands
here are data-dependent.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_med(fn, reps=7, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-baseline", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

    import numpy as np

    from stark_tpu.fields import FieldElement, fe
    from stark_tpu.poly import Polynomial, gen_lagrange_polynomials, interpolate_lagrange

    res = {}
    here = os.path.dirname(os.path.abspath(__file__))

    # -- field ops, scalar host mirror (field_bench.rs:12-34 analog;
    #    M = 2^31 - 1 like the reference) ---------------------------------
    M = (1 << 31) - 1
    rng = np.random.default_rng(0)
    xs = [fe(int(v), M) for v in rng.integers(1, M, 1000)]
    ys = [fe(int(v), M) for v in rng.integers(1, M, 1000)]

    def each(op):
        def run():
            for a, b in zip(xs, ys):
                op(a, b)
        return run

    for name, op in [
        ("field_add_ns", lambda a, b: a + b),
        ("field_mul_ns", lambda a, b: a * b),
        ("field_pow10_ns", lambda a, b: a.pow(10)),
        ("field_inverse_ns", lambda a, b: a.inverse()),
    ]:
        res[name] = t_med(each(op)) / 1000 * 1e9
    print(f"scalar field (M=2^31-1): add {res['field_add_ns']:.0f}ns  "
          f"mul {res['field_mul_ns']:.0f}ns  pow10 {res['field_pow10_ns']:.0f}ns  "
          f"inv {res['field_inverse_ns']:.0f}ns", file=sys.stderr)

    # -- poly ops over GF(17)-style small field (poly_ops.rs analog;
    #    we use the 2-adic test field so NTT mul also engages) -------------
    from stark_tpu.config import DEFAULT_MODULUS as P

    for deg in (10, 100, 1000):
        a = Polynomial.random(deg, P, np.random.default_rng(1))
        b = Polynomial.random(deg, P, np.random.default_rng(2))
        res[f"poly_add_deg{deg}_us"] = t_med(lambda: a + b) * 1e6
        res[f"poly_mul_deg{deg}_us"] = t_med(lambda: a * b, reps=5) * 1e6
        res[f"poly_divrem_deg{deg}_us"] = t_med(lambda: divmod(a, b), reps=5) * 1e6
        res[f"poly_eval_deg{deg}_us"] = t_med(lambda: a.evaluate(12345)) * 1e6
    for deg in (10, 50, 100):
        a = Polynomial.random(deg, P, np.random.default_rng(3))
        b = Polynomial.random(deg, P, np.random.default_rng(4))
        res[f"poly_compose_deg{deg}_ms"] = t_med(lambda: a.compose(b), reps=3) * 1e3
    print(f"poly mul deg 10/100/1000: {res['poly_mul_deg10_us']:.1f} / "
          f"{res['poly_mul_deg100_us']:.1f} / {res['poly_mul_deg1000_us']:.1f} us "
          f"(reference schoolbook: 0.2 / 13 / 1261 us)", file=sys.stderr)

    # -- Lagrange (poly_lang.rs analog, n = 10..500) -----------------------
    for n in (10, 50, 100, 200, 500):
        pts = np.unique(np.random.default_rng(5).integers(0, P, 3 * n, dtype=np.int64))[: 2 * n]
        xs_l = pts[:n].tolist()
        ys_l = pts[n:].tolist()
        res[f"lagrange_basis_n{n}_ms"] = t_med(
            lambda: gen_lagrange_polynomials(xs_l, P), reps=3, warmup=1) * 1e3
        res[f"lagrange_interp_n{n}_ms"] = t_med(
            lambda: interpolate_lagrange(xs_l, ys_l, P), reps=3, warmup=1) * 1e3
    print(f"lagrange interpolate n=500: {res['lagrange_interp_n500_ms']:.1f} ms "
          f"(reference rayon-parallel: 2.38 ms over GF(7))", file=sys.stderr)

    # -- regression comparison --------------------------------------------
    from stark_tpu.utils.regression import compare, save_baseline

    base_path = os.path.join(here, "micro_baseline.json")
    verdicts = compare(res, base_path)
    regressions = [v for v in verdicts if v["verdict"] == "regressed"]
    for v in verdicts:
        if v["verdict"] != "unchanged":
            print(f"  {v['verdict'].upper()}: {v['metric']} "
                  f"{v['baseline']:.3g} -> {v['current']:.3g} "
                  f"({v['change_pct']:+.1f}%)", file=sys.stderr)
    with open(os.path.join(here, "micro_latest.json"), "w") as fh:
        json.dump(res, fh, indent=2)
    if args.save_baseline or not os.path.exists(base_path):
        save_baseline(res, base_path)
        print("baseline saved", file=sys.stderr)

    print(json.dumps({"regressions": len(regressions),
                      "metrics": len(res)}))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
