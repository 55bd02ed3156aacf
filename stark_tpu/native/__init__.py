"""Native host engine loader (ctypes, build-on-demand).

Compiles sha256_merkle.cpp with g++ -O3 into _libstark.so on first use
(cached; rebuilt when the source is newer).  Every entry point has a pure
Python fallback (hashlib), so the framework works without a toolchain —
the native path makes host-side verification and Merkle oracles ~20x
faster.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sha256_merkle.cpp")
_LIB = os.path.join(_DIR, "_libstark.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing or failed: fall back
        print(f"stark_tpu.native: build failed ({e}); using Python fallback",
              file=sys.stderr)
        return False


def get_lib():
    """The loaded CDLL, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)
    lib.stark_sha256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
    lib.stark_merkle_build.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t, ctypes.c_char_p,
    ]
    lib.stark_merkle_build.restype = ctypes.c_size_t
    lib.stark_merkle_validate.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.stark_merkle_validate.restype = ctypes.c_int
    lib.stark_channel_absorb.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p,
    ]
    for fn in (lib.stark_fib_trace, lib.stark_mimc_trace,
               lib.stark_fibmul_trace):
        fn.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint64),
        ]
    _lib = lib
    return _lib


def sha256(data: bytes) -> bytes:
    lib = get_lib()
    if lib is None:
        return hashlib.sha256(data).digest()
    out = ctypes.create_string_buffer(32)
    lib.stark_sha256(data, len(data), out)
    return out.raw


def merkle_validate(root_hex: str, proof: bytes, index: int, leaf8: bytes,
                    num_leaves: int) -> bool:
    lib = get_lib()
    if lib is None:
        from stark_tpu.merkle.tree import MerkleTree

        return MerkleTree.validate(root_hex, proof, index, leaf8, num_leaves)
    try:
        root = bytes.fromhex(root_hex)
    except ValueError:
        return False
    if len(root) != 32 or len(leaf8) != 8:
        return False
    return bool(
        lib.stark_merkle_validate(root, proof, len(proof), index, leaf8, num_leaves)
    )


def merkle_build_host(values) -> list[bytes]:
    """All tree digests bottom-up (n + n/2 + ... + 1 entries of 32 bytes).
    Native fast path for the host oracle."""
    import numpy as np

    lib = get_lib()
    vals = np.ascontiguousarray(np.asarray(values, dtype=np.uint64))
    n = len(vals)
    if lib is None:
        level = [hashlib.sha256(int(v).to_bytes(8, "big")).digest() for v in vals]
        out = list(level)
        while len(level) > 1:
            nxt = [
                hashlib.sha256(level[i] + level[i + 1]).digest()
                for i in range(0, len(level) - 1, 2)
            ]
            if len(level) % 2:
                nxt.append(level[-1])
            out.extend(nxt)
            level = nxt
        return out
    total = 0
    size = n
    while True:
        total += size
        if size == 1:
            break
        size = (size + 1) // 2
    buf = ctypes.create_string_buffer(32 * total)
    wrote = lib.stark_merkle_build(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n, buf
    )
    if wrote != total:
        raise RuntimeError(
            f"native merkle build wrote {wrote} nodes, expected {total}")
    return [buf.raw[32 * i : 32 * (i + 1)] for i in range(total)]


def host_trace(kind: str, p: int, arg0: int, arg1: int, n: int):
    """Sequential AIR trace on host (uint64 numpy array of n canonical
    values; (2, n) for the two-column "fibmul"), or None when the native
    lib is unavailable.  kind: "fib" (arg0=a0, arg1=a1), "mimc" (arg0=x0,
    arg1=k), or "fibmul" (arg0=a0, arg1=b0).  Exact for p < 2^64."""
    lib = get_lib()
    if lib is None or not (0 < p < 1 << 64):
        return None
    import numpy as np

    fn = {"fib": lib.stark_fib_trace, "mimc": lib.stark_mimc_trace,
          "fibmul": lib.stark_fibmul_trace}[kind]
    shape = (2, n) if kind == "fibmul" else (n,)
    out = np.empty(shape, dtype=np.uint64)
    fn(p, arg0 % p, arg1 % p, n, out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint64)))
    return out


def channel_absorb(state_hex: str, message: bytes) -> str:
    """state' = sha256_hex(utf8(state ++ hex(msg))) — the reference's send
    semantics (channel.rs:35-44), native."""
    lib = get_lib()
    if lib is None:
        return hashlib.sha256((state_hex + message.hex()).encode()).hexdigest()
    out = ctypes.create_string_buffer(64)
    lib.stark_channel_absorb(
        state_hex.encode(), len(state_hex), message, len(message), out
    )
    return out.raw.decode()
