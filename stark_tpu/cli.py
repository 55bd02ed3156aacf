"""CLI — ``python -m stark_tpu <prove|verify|bench|info>``.

The reference's binary only demos its logger (src/main.rs:8-16); this is
the prove/verify/bench entry point the reference planned (SURVEY §2 row
"Binary").
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# named field shortcuts: (modulus, multiplicative generator)
_FIELDS = {
    "stark101": (3 * 2**30 + 1, 5),
    "goldilocks": (2**64 - 2**32 + 1, 7),
}


def _field(value: str):
    if value in _FIELDS:
        return _FIELDS[value]
    return (int(value), None)


def _add_config_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--log2-trace", type=int, default=10,
                    help="trace rows = 2^k - 1 (default 10: STARK-101 shape)")
    ap.add_argument("--blowup", type=int, default=8)
    ap.add_argument("--num-queries", type=int, default=16)
    ap.add_argument("--modulus", type=_field, default=None, metavar="P",
                    help="field modulus (int), or a name: "
                    + ", ".join(_FIELDS))
    ap.add_argument("--generator", type=int, default=None,
                    help="multiplicative generator of GF(p) (auto for "
                    "named fields)")
    ap.add_argument("--cpu", action="store_true", help="pin to local CPU backend")
    ap.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="shard over an N-device mesh")


def _make_config(args):
    from stark_tpu.config import DEFAULT_MODULUS, ProverConfig

    modulus, gen = args.modulus if args.modulus else (DEFAULT_MODULUS, None)
    if args.generator is not None:
        gen = args.generator
    kw = {"generator": gen} if gen is not None else {}
    return ProverConfig(
        modulus=modulus,
        log2_trace=args.log2_trace,
        blowup=args.blowup,
        num_queries=args.num_queries,
        **kw,
    )


def _setup(args):
    import jax

    from stark_tpu.utils.logging import setup_logging

    log = setup_logging()
    if args.cpu:
        jax.config.update(
            "jax_default_device", jax.local_devices(backend="cpu")[0]
        )
    mesh = None
    if args.mesh:
        from stark_tpu.dist import make_mesh

        devices = (
            jax.local_devices(backend="cpu") if args.cpu else jax.devices()
        )
        mesh = make_mesh(args.mesh, devices=devices[: args.mesh])
    return log, mesh


def cmd_prove(args) -> int:
    from stark_tpu.stark import prove
    from stark_tpu.stark.families import build_air

    log, mesh = _setup(args)
    cfg = _make_config(args)
    cfg.validate()
    log.info("proving %s: 2^%d-1 rows, blowup %d, %d queries%s",
             args.air, args.log2_trace, args.blowup, args.num_queries,
             f", {args.mesh}-device mesh" if mesh else "")
    if getattr(args, "daemon", False):
        from stark_tpu import serve

        info = serve.ensure_daemon(args.socket)
        log.info("daemon pid %d on %s (%s, %d proves served)",
                 info["pid"], args.socket or serve.default_socket_path(),
                 info["platform"], info["proves"])
        t0 = time.perf_counter()
        proof = serve.daemon_prove(
            cfg, air=args.air, secret=args.secret, mimc_key=args.mimc_key,
            socket_path=args.socket)
        dt = time.perf_counter() - t0
        blob = proof.serialize(compress=args.compress)
        with open(args.output, "wb") as fh:
            fh.write(blob)
        log.info("proved via daemon in %.2fs: %d transcript bytes -> %s",
                 dt, proof.size_bytes(), args.output)
        return 0
    t0 = time.perf_counter()
    air = build_air(args.air, args.secret, mimc_key=args.mimc_key)
    proof = prove(cfg, a1=args.secret, mesh=mesh, air=air)
    dt = time.perf_counter() - t0
    blob = proof.serialize(compress=args.compress)
    with open(args.output, "wb") as fh:
        fh.write(blob)
    log.info("proved in %.2fs: %d transcript bytes, %d on disk%s -> %s "
             "(public output a_last=%d)",
             dt, proof.size_bytes(), len(blob),
             " (compressed)" if args.compress else "", args.output,
             proof.a_last)
    return 0


def cmd_verify(args) -> int:
    from stark_tpu.stark import StarkProof, StarkVerificationError, verify

    log, _ = _setup(args)
    with open(args.proof, "rb") as fh:
        try:
            proof = StarkProof.deserialize(fh.read())
        except Exception as e:  # corrupt container: reject, don't crash
            log.error("proof REJECTED: unreadable container (%s)", e)
            return 1
    t0 = time.perf_counter()
    try:
        verify(proof)
    except StarkVerificationError as e:
        log.error("proof REJECTED: %s", e)
        return 1
    log.info("proof verified in %.3fs (a0=%d, a_last=%d)",
             time.perf_counter() - t0, proof.a0, proof.a_last)
    return 0


def cmd_bench(args) -> int:
    import subprocess

    cmd = [sys.executable, "bench.py"]
    if args.quick:
        cmd.append("--quick")
    if args.cpu:
        cmd.append("--cpu")
    return subprocess.call(cmd)


def cmd_serve(args) -> int:
    from stark_tpu import serve
    from stark_tpu.config import ProverConfig
    from stark_tpu.stark import prove
    from stark_tpu.utils.logging import setup_logging

    log = setup_logging()
    if args.cpu:
        import jax

        jax.config.update(
            "jax_default_device", jax.local_devices(backend="cpu")[0])
    for log2 in args.warm or ():
        t0 = time.perf_counter()
        prove(ProverConfig(log2_trace=log2, blowup=4, num_queries=16))
        log.info("warm prove 2^%d done in %.1fs", log2,
                 time.perf_counter() - t0)
    server = serve.ProverServer(args.socket)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_info(args) -> int:
    import jax

    import stark_tpu
    from stark_tpu.native import get_lib

    print(f"stark_tpu {stark_tpu.__version__}")
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    print(f"native host engine: {'built' if get_lib() else 'unavailable (hashlib fallback)'}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stark_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prove", help="produce a STARK proof")
    _add_config_args(p)
    p.add_argument("--secret", type=int, default=3141592,
                   help="the private a_1 / x_0 (default: STARK-101's pi)")
    from stark_tpu.stark.families import FAMILIES

    p.add_argument("--air", default="fibonacci-square",
                   choices=["fibonacci-square", "mimc3", "fibmul",
                            *FAMILIES],
                   help="statement family to prove (families beyond the "
                        "first three are declarative AirSpec specs)")
    p.add_argument("--mimc-key", type=int, default=777)
    p.add_argument("-o", "--output", default="proof.json")
    p.add_argument("--compress", action="store_true",
                   help="write the binary node-deduplicated container "
                        "(channel/compress.py) instead of JSON")
    p.add_argument("--daemon", action="store_true",
                   help="prove via the resident daemon (spawning it if "
                        "needed): repeat proves skip per-process program "
                        "acquisition entirely (stark_tpu/serve.py)")
    p.add_argument("--socket", default=None,
                   help="daemon socket path (default: per-user tmp)")
    p.set_defaults(fn=cmd_prove)

    p = sub.add_parser(
        "serve", help="run the resident prover daemon (stark_tpu/serve.py)")
    p.add_argument("--socket", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--warm", type=int, nargs="*", default=None,
                   metavar="LOG2_TRACE",
                   help="prewarm the prove pipeline at these trace sizes "
                        "before serving (e.g. --warm 14 18)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("verify", help="verify a proof file")
    p.add_argument("proof")
    p.add_argument("--cpu", action="store_true")
    p.set_defaults(fn=cmd_verify, mesh=None)

    p = sub.add_parser("bench", help="run the benchmark suite")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("info", help="environment info")
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
