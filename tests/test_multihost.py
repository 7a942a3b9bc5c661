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


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def by_pid():
    """Spawn the 2-process worker pair ONCE; every test below reads its
    RESULT payload (the worker runs all four families in one process pair to
    amortise the distributed-JAX startup)."""
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
    return {r["pid"]: r for r in results}


def test_two_process_training_matches_single_process(by_pid):
    assert by_pid[0]["main"] and not by_pid[1]["main"]
    for r in by_pid.values():
        assert r["devices"] == 8 and r["local_devices"] == 4

    # cross-process feature gather: 2 processes x 4 rows, values pid+1
    for r in by_pid.values():
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


def test_two_process_finetune_matches_single_incl_bn_stats(by_pid):
    """The finetune family (CE + BatchNorm head) across a REAL process
    boundary: loss trajectory AND the BN running-stat digest must match the
    single-process 8-device run — SyncBN-by-construction holds under gloo,
    not just under the in-process mesh (reference --sync_bn,
    tools/runner_pretrain.py:88-91)."""
    assert by_pid[0]["ft_losses"] == pytest.approx(by_pid[1]["ft_losses"], rel=1e-6)
    # both processes hold the replicated state: digests must agree tightly
    for leaf, (s, _) in by_pid[0]["ft_bn"].items():
        assert by_pid[1]["ft_bn"][leaf][0] == pytest.approx(s, rel=1e-6, abs=1e-9)
    from mh_common import run_finetune

    single_losses, single_bn = run_finetune()
    assert by_pid[0]["ft_losses"] == pytest.approx(single_losses, rel=2e-4)
    # vs single-process: gloo/psum reduction-order rounding amplifies ~x10 per
    # Adam step (CLAUDE.md round-3 trajectory learnings), so the cross-layout
    # bound is |d(sum)| <= 2e-3 * magnitude, with sum(|x|) as the magnitude
    # scale (near-zero sums cancel catastrophically)
    got = by_pid[0]["ft_bn"]
    assert set(got) == set(single_bn)
    for leaf, (s, sabs) in single_bn.items():
        tol = 2e-3 * max(sabs, 1.0)
        assert abs(got[leaf][0] - s) <= tol, (leaf, got[leaf], s, sabs)


def test_two_process_seg_matches_single(by_pid):
    """The segmentation family (category-conditioned per-point CE) across a
    real process boundary."""
    assert by_pid[0]["seg_losses"] == pytest.approx(by_pid[1]["seg_losses"], rel=1e-6)
    for leaf, (s, _) in by_pid[0]["seg_bn"].items():
        assert by_pid[1]["seg_bn"][leaf][0] == pytest.approx(s, rel=1e-6, abs=1e-9)
    from mh_common import run_seg

    single_losses, single_bn = run_seg()
    assert by_pid[0]["seg_losses"] == pytest.approx(single_losses, rel=2e-4)
    for leaf, (s, sabs) in single_bn.items():
        tol = 2e-3 * max(sabs, 1.0)
        assert abs(by_pid[0]["seg_bn"][leaf][0] - s) <= tol, (leaf, s, sabs)


def test_two_process_probe_gather_matches_single_extraction(by_pid):
    """The REAL SVM-probe feature path: each process extracts pooled features
    for its shard of a global labelled set, the cross-process allgather
    (parallel/multihost.py) reassembles the full set — and it must equal the
    single-process extraction over the whole set row-for-row
    (main_pretrain.py:685-689, dist_utils.gather_tensor)."""
    import numpy as np

    from mh_common import probe_features

    single_f, single_l = probe_features()
    for pid in (0, 1):
        got_f = np.asarray(by_pid[pid]["probe_feats"], np.float32)
        got_l = np.asarray(by_pid[pid]["probe_labels"])
        assert got_f.shape == single_f.shape
        np.testing.assert_allclose(got_f, single_f, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got_l, single_l)
