"""REAL multi-process metric gather: two JAX processes over a loopback
coordinator exercise the ``process_count() > 1`` branch of
far_tpu/parallel/comm.py:all_gather_metrics plus the identifier dedup —
the path VERDICT r2 flagged as executed by no test (reference
equivalent: mp3d_loftr/src/utils/comm.py:141-219 gloo gather).

Marked slow: spawns two fresh interpreters (compile + grpc startup).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_gather_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_gather_and_dedup():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
        assert f"MP_GATHER_OK rank={pid} n=5" in out, out[-3000:]
