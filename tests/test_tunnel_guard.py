"""Tunnel-liveness guard (stark_tpu/utils/tunnel.py).

The guard keeps bench.py / __graft_entry__.py from hanging forever when
the environment's TPU tunnel is configured but unreachable (backend init
blocks instead of raising).  The probe's subprocess mechanics are tested
with a stubbed canary so the tests are deterministic regardless of
whether a real tunnel exists.
"""

import json
import time

import pytest

from stark_tpu.utils import tunnel


@pytest.fixture
def state_path(tmp_path, monkeypatch):
    p = tmp_path / "state.json"
    monkeypatch.setattr(tunnel, "_STATE_PATH", str(p))
    return p


class TestProbe:
    def test_no_tunnel_configured(self, monkeypatch, state_path):
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        assert tunnel.probe_tunnel() is None
        assert tunnel.ensure_live_backend() == "local"

    def test_live_canary(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "print('TUNNEL-LIVE')")
        assert tunnel.probe_tunnel(timeout=30, use_cache=False) is True
        assert json.load(open(state_path))["alive"] is True

    def test_hung_canary_times_out(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setattr(
            tunnel, "_CANARY_SRC", "import time; time.sleep(60)"
        )
        t0 = time.perf_counter()
        assert tunnel.probe_tunnel(timeout=1.5, use_cache=False) is False
        assert time.perf_counter() - t0 < 30  # bounded, not a hang
        assert json.load(open(state_path))["alive"] is False

    def test_failing_canary(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "raise SystemExit(3)")
        assert tunnel.probe_tunnel(timeout=30, use_cache=False) is False


class TestCache:
    def test_cache_hit_skips_probe(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        state_path.write_text(json.dumps({"ts": time.time(), "alive": True}))
        # canary would say dead; the fresh cache short-circuits it
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "raise SystemExit(1)")
        assert tunnel.probe_tunnel(timeout=30) is True

    def test_stale_cache_reprobes(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        state_path.write_text(
            json.dumps({"ts": time.time() - 10_000, "alive": True})
        )
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "raise SystemExit(1)")
        assert tunnel.probe_tunnel(timeout=30) is False


class TestRetry:
    def test_retries_until_live(self, monkeypatch, state_path, tmp_path):
        """A canary that fails once then succeeds must yield alive=True
        when retries>1 (r4's one-shot canary condemned a live TPU)."""
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        flag = tmp_path / "second_try"
        src = (
            "import os,sys;"
            f"p={str(flag)!r};"
            "ok=os.path.exists(p);"
            "open(p,'w').close();"
            "print('TUNNEL-LIVE' if ok else 'down')"
        )
        monkeypatch.setattr(tunnel, "_CANARY_SRC", src)
        assert tunnel.probe_tunnel(
            timeout=30, use_cache=False, retries=3, retry_sleep=0.0
        ) is True
        assert json.load(open(state_path))["alive"] is True

    def test_cached_negative_ignored_for_artifact_path(
        self, monkeypatch, state_path
    ):
        """honor_cached_negative=False must re-probe even when another
        process just cached a 'dead' verdict (r4 Weak #2: the driver's
        bench honored a stale negative while the TPU was answering)."""
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        state_path.write_text(json.dumps({"ts": time.time(), "alive": False}))
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "print('TUNNEL-LIVE')")
        # default path honors the cached negative
        assert tunnel.probe_tunnel(timeout=30) is False
        # artifact path re-probes and finds the tunnel alive
        assert tunnel.probe_tunnel(
            timeout=30, honor_cached_negative=False
        ) is True

    def test_cached_positive_still_honored(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        state_path.write_text(json.dumps({"ts": time.time(), "alive": True}))
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "raise SystemExit(1)")
        assert tunnel.probe_tunnel(
            timeout=30, honor_cached_negative=False
        ) is True


class TestEnsure:
    def test_force_axon_skips_probe(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setenv("STARK_TPU_FORCE_AXON", "1")
        monkeypatch.setattr(
            tunnel, "_CANARY_SRC", "import time; time.sleep(60)"
        )
        assert tunnel.ensure_live_backend() == "axon"

    def test_dead_tunnel_pins_cpu(self, monkeypatch, state_path):
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.delenv("STARK_TPU_FORCE_AXON", raising=False)
        monkeypatch.setattr(tunnel, "_CANARY_SRC", "raise SystemExit(1)")
        assert tunnel.ensure_live_backend(timeout=30) == "cpu"
        # force_cpu ran; jax must still function on the CPU backend
        import jax
        import jax.numpy as jnp

        assert int(jax.jit(lambda x: x + 1)(jnp.uint32(1))) == 2

    def test_force_cpu_idempotent_after_init(self):
        # backends are already initialised under pytest; must not raise
        tunnel.force_cpu()
        import jax

        assert jax.local_devices(backend="cpu")
