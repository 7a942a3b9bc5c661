"""True multi-process multi-host test (SURVEY.md §2.4 / §5.8).

Spawns TWO separate JAX processes (gloo collectives, 4 virtual CPU devices
each) that jointly form an 8-device data-parallel mesh, run sharded PointMAE
train steps, and all-gather SVM features across processes — then checks the
loss trajectory matches the single-process 8-device run of the SAME code
(``mh_common.run_training``) executed in this pytest process.

This validates the reference's DDP + gather_tensor capability
(``main_pretrain.py:389-391``, ``utils/dist_utils.py:50-54``) end-to-end
across a real process boundary, not just a simulated mesh.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_mh_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["PYTHONPATH"] = repo + os.pathsep + os.path.join(repo, "tests")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-3000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))

    by_pid = {r["pid"]: r for r in results}
    assert by_pid[0]["main"] and not by_pid[1]["main"]
    for r in results:
        assert r["devices"] == 8 and r["local_devices"] == 4

    # cross-process feature gather: 2 processes x 4 rows, values pid+1
    for r in results:
        assert r["gather_rows"] == 8
        assert r["gather_sum"] == pytest.approx((1 + 2) * 4 * 8)
        assert sorted(r["labels"]) == [0, 0, 0, 0, 1, 1, 1, 1]

    # the 2-process losses must agree across processes and with the
    # single-process 8-device run of the identical code
    assert by_pid[0]["losses"] == pytest.approx(by_pid[1]["losses"], rel=1e-6)
    from mh_common import run_training

    single = run_training()
    assert by_pid[0]["losses"] == pytest.approx(single, rel=2e-4)
    # and training actually trains
    assert single[-1] < single[0]
