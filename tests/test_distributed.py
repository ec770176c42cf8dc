"""Multi-host (multi-process) data-parallel training test.

Launches two worker processes, each owning 2 virtual CPU devices, connected
through the JAX coordination service into one 4-device global dp mesh — the
CPU stand-in for a 2-host TPU slice (parallel/mesh.py initialize_distributed
/ shard_pytree_batch multi-process paths).  Verifies both processes complete
two sharded train steps and end with identical parameters (the gradient
all-reduce is consistent across hosts).  The reference has no multi-machine
test at all (SURVEY.md §4); its dist*_sync kvstore path was never exercised.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_training():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d+) step=(\d+) checksum=([\d.]+) total=([\d.]+)", out)
        assert m, f"no RESULT line in:\n{out[-4000:]}"
        results[int(m.group(1))] = (int(m.group(2)), float(m.group(3)), float(m.group(4)))

    assert set(results) == {0, 1}
    # Two pstep calls x TRAIN_ITER_SIZE(2) inner iterations = 4 steps.
    assert results[0][0] == results[1][0] == 4
    # Parameters identical across hosts after the all-reduced updates.
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)
    assert results[0][2] == pytest.approx(results[1][2], rel=1e-5)
