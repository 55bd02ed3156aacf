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
