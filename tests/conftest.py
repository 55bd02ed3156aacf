"""Test env: force CPU backend with 8 virtual devices so sharding tests run
anywhere (SURVEY §4: single-process multi-device simulation is the JAX
"fake backend" for distributed testing).  Must run before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's TPU plugin overrides JAX_PLATFORMS at the *config*
# level (the env var alone is ignored) and would make the remote TPU the
# default device — every test op would round-trip a network tunnel, and
# backend init HANGS outright if the tunnel is down.  Pin the platform
# list and default device to local CPU before any backend initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

# No XLA persistent compilation cache in tests — neither writes nor
# reads.  XLA:CPU executable serialization is unsound in this jaxlib:
# writes SEGFAULT in put_executable_and_time once the process holds the
# suite's hundreds of live executables (deterministic at
# tests/test_fri.py::test_commit_decommit_verify, 4/4 full-suite runs
# 2026-08-21), and with writes disabled the suite STILL aborted inside
# backend_compile_and_load while cached AOT entries from earlier
# sessions were being loaded (cpu_aot_loader warns "could lead to
# execution errors such as SIGILL" on every such load).
# stark_tpu/__init__ now skips the XLA cache wholesale for CPU-default
# sessions (the jax.export program cache — utils/progcache — is a
# separate mechanism and stays available); the lines below are
# belt-and-braces against anything else configuring a cache dir.
jax.config.update("jax_compilation_cache_dir", None)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10**9)
