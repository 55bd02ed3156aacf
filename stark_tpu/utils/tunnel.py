"""TPU-tunnel liveness guard.

This environment reaches its TPU through a network relay: a PJRT plugin
registered at interpreter start (when ``PALLAS_AXON_POOL_IPS`` is set)
force-appends the remote platform to jax's platform list and dials the
relay at backend initialisation.  When the relay is unreachable the dial
blocks forever instead of raising, so ANY jax backend use — even
``jax.local_devices(backend="cpu")``, which initialises every configured
platform — hangs the process.

``ensure_live_backend()`` probes the tunnel from a throwaway subprocess
(which a timeout can kill; the parent process cannot be un-hung) and, if
the tunnel does not answer, pins THIS process to the CPU backend before
jax initialises anything.  Call it before the first backend use in any
entry point that must never hang (bench harness, driver entry points).

The probe result is cached in a temp file for a short TTL so a burst of
processes (bench -> entry -> dryrun) pays the probe timeout once.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

_CANARY_SRC = (
    "import jax, numpy as np, jax.numpy as jnp;"
    "x = jax.jit(lambda v: v * 2 + 1)(jnp.ones(8, jnp.uint32));"
    "assert int(np.asarray(x)[0]) == 3;"
    "print('TUNNEL-LIVE')"
)

_STATE_PATH = os.path.join(tempfile.gettempdir(), "stark_tpu_tunnel_state.json")
_STATE_TTL_S = 240.0


def _cached_state():
    try:
        with open(_STATE_PATH) as fh:
            st = json.load(fh)
        if time.time() - float(st["ts"]) < _STATE_TTL_S:
            return bool(st["alive"])
    except Exception:
        pass
    return None


def _write_state(alive):
    try:
        with open(_STATE_PATH, "w") as fh:
            json.dump({"ts": time.time(), "alive": bool(alive)}, fh)
    except OSError:
        pass


def _run_canary(timeout):
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CANARY_SRC],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        return "TUNNEL-LIVE" in (r.stdout or "")
    except (subprocess.TimeoutExpired, OSError):
        return False


def probe_tunnel(timeout=120.0, use_cache=True, retries=1, retry_sleep=30.0,
                 honor_cached_negative=True):
    """True iff the remote TPU answers a tiny jit within ``timeout``.

    Runs in a subprocess so a dead tunnel costs one bounded wait instead
    of a permanent hang.  Only meaningful when ``PALLAS_AXON_POOL_IPS``
    is set; returns None when no tunnel is configured.

    ``retries`` polls the canary that many times (sleeping
    ``retry_sleep`` between failures) before declaring the tunnel dead —
    a single slow canary (first-jit on a congested tunnel) must not
    condemn a whole bench run (BENCH_r04's CPU-fallback artifact came
    from exactly that).  ``honor_cached_negative=False`` ignores a
    cached "dead" verdict and re-probes: callers about to produce the
    round's official artifact must never trust a stale negative.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return None
    if use_cache:
        cached = _cached_state()
        if cached is True:
            return True
        if cached is False and honor_cached_negative:
            return False
    alive = False
    for attempt in range(max(1, int(retries))):
        if attempt:
            time.sleep(retry_sleep)
        alive = _run_canary(timeout)
        if alive:
            break
    _write_state(alive)
    return alive


def force_cpu():
    """Pin this process's jax to the CPU backend (best effort).

    Must run before the first backend initialisation; afterwards jax
    raises on the config update, which is swallowed — by then a backend
    exists and the process is not going to hang.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def ensure_live_backend(timeout=120.0, retries=1, retry_sleep=30.0,
                        honor_cached_negative=True):
    """Guard an entry point against a dead TPU tunnel.

    Returns the platform this process will use: ``"local"`` (no tunnel
    configured — whatever jax picks), ``"axon"`` (tunnel answered), or
    ``"cpu"`` (tunnel dead — process pinned to CPU).  Set
    ``STARK_TPU_FORCE_AXON=1`` to skip the probe and trust the tunnel.

    Artifact-producing callers (bench.py's non-quick path) should pass
    ``retries>1, honor_cached_negative=False`` so a transiently slow
    canary — or another process's stale negative verdict — cannot turn
    the round's official record into a CPU-fallback run (r4 Weak #2).
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return "local"
    if os.environ.get("STARK_TPU_FORCE_AXON") == "1":
        return "axon"
    if probe_tunnel(timeout=timeout, retries=retries, retry_sleep=retry_sleep,
                    honor_cached_negative=honor_cached_negative):
        return "axon"
    force_cpu()
    return "cpu"
