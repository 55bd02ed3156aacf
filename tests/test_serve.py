"""Prover daemon (stark_tpu/serve.py): framed-socket protocol, transcript
identity with in-process proves, error paths, and lifecycle.

The daemon exists because program residency is the TPU-native answer to
cold start (an in-process warm prove is ~0.13 s while per-process program
acquisition costs tens of seconds — benches/probe_warmcompile_r5.py);
these tests run it in-thread on a tmp socket so they stay CPU-cheap.
"""

import socket
import struct
import threading
import time

import pytest

from stark_tpu import serve
from stark_tpu.config import ProverConfig
from stark_tpu.stark import prove, verify


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sock") / "d.sock")
    server = serve.ProverServer(path)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            serve.ping(path)
            break
        except (ConnectionError, OSError):
            time.sleep(0.05)
    else:
        raise RuntimeError("daemon did not come up")
    yield path
    try:
        serve.request({"op": "shutdown"}, path, timeout=10)
    except (ConnectionError, OSError):
        pass
    t.join(timeout=10)


CFG = ProverConfig(log2_trace=6, blowup=4, num_queries=4)


class TestProtocol:
    def test_ping(self, daemon):
        info = serve.ping(daemon)
        assert info["ok"] and info["platform"] and "pid" in info

    def test_prove_matches_in_process_transcript(self, daemon):
        via_daemon = serve.daemon_prove(CFG, secret=3141592,
                                        socket_path=daemon)
        direct = prove(CFG, a1=3141592)
        assert via_daemon.proof == direct.proof
        assert verify(via_daemon)

    def test_prove_other_family(self, daemon):
        via_daemon = serve.daemon_prove(CFG, air="fibmul", secret=2718281,
                                        socket_path=daemon)
        from stark_tpu.stark import FibMulAIR

        direct = prove(CFG, air=FibMulAIR(b0=2718281))
        assert via_daemon.proof == direct.proof

    def test_compressed_container_roundtrip(self, daemon):
        p = serve.daemon_prove(CFG, compress=True, socket_path=daemon)
        assert verify(p)

    def test_unknown_op_is_error_not_crash(self, daemon):
        resp = serve.request({"op": "transmogrify"}, daemon)
        assert resp == {"ok": False, "error": "unknown op 'transmogrify'"}
        assert serve.ping(daemon)["ok"]  # still serving

    def test_bad_config_is_error_not_crash(self, daemon):
        resp = serve.request(
            {"op": "prove", "config": {"modulus": 6}}, daemon)
        assert not resp["ok"] and "error" in resp
        assert serve.ping(daemon)["ok"]

    def test_bad_air_is_error(self, daemon):
        resp = serve.request(
            {"op": "prove", "config": {"log2_trace": 6, "blowup": 4,
                                       "num_queries": 4},
             "air": "nope"}, daemon)
        assert not resp["ok"] and "nope" in resp["error"]

    def test_warm_returns_no_proof(self, daemon):
        resp = serve.request(
            {"op": "warm",
             "config": {"log2_trace": 6, "blowup": 4, "num_queries": 4}},
            daemon)
        assert resp["ok"] and "proof_b64" not in resp

    def test_stats(self, daemon):
        resp = serve.request({"op": "stats"}, daemon)
        assert resp["ok"] and resp["proves"] >= 1

    def test_garbage_frame_does_not_kill_server(self, daemon):
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.connect(daemon)
            s.sendall(struct.pack(">I", 7) + b"not-js")
            s.close()
        assert serve.ping(daemon)["ok"]


class TestClientErrors:
    def test_no_daemon_raises(self, tmp_path):
        with pytest.raises((ConnectionError, OSError)):
            serve.ping(str(tmp_path / "none.sock"), timeout=1.0)

    def test_frame_too_large_rejected(self):
        class Fake:
            def __init__(self):
                self.data = struct.pack(">I", serve._MAX_FRAME + 1)
                self.pos = 0

            def recv(self, n):
                chunk = self.data[self.pos:self.pos + n]
                self.pos += len(chunk)
                return chunk

        with pytest.raises(ConnectionError, match="frame too large"):
            serve._recv_frame(Fake())


def test_default_socket_path_env(monkeypatch):
    monkeypatch.setenv("STARK_TPU_SOCKET", "/tmp/x.sock")
    assert serve.default_socket_path() == "/tmp/x.sock"
    monkeypatch.delenv("STARK_TPU_SOCKET")
    assert "stark_tpu-" in serve.default_socket_path()
