"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; gloo carries the cross-process
collectives. Runs the same deterministic sharded PointMAE train steps as the
in-process single-controller reference and prints a JSON result line.

Usage: python tests/_mh_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

from mh_common import probe_features, run_finetune, run_seg, run_training  # noqa: E402

from gm3d_tpu.parallel.multihost import gather_features, is_main_process  # noqa: E402

losses = run_training()

# exercise the eval-side gather: each process contributes a distinct block
feats = np.full((4, 8), float(pid + 1), np.float32)
labels = np.full((4,), pid, np.int64)
gf, gl = gather_features(feats, labels)

# the other training families across the same process boundary (round 4)
ft_losses, ft_bn = run_finetune()
seg_losses, seg_bn = run_seg()

# the REAL probe feature path: this process extracts features for ITS shard
# of the global labelled set, then the cross-process gather reassembles the
# full set (main_pretrain.py:685-689 / dist_utils.gather_tensor semantics)
rows = slice(pid * 4, (pid + 1) * 4)
local_feats, local_labels = probe_features(rows)
probe_f, probe_l = gather_features(local_feats, local_labels)

print(
    "RESULT "
    + json.dumps(
        {
            "pid": pid,
            "main": is_main_process(),
            "devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "losses": losses,
            "gather_rows": int(gf.shape[0]),
            "gather_sum": float(gf.sum()),
            "labels": np.asarray(gl).tolist(),
            "ft_losses": ft_losses,
            "ft_bn": ft_bn,
            "seg_losses": seg_losses,
            "seg_bn": seg_bn,
            "probe_feats": np.asarray(probe_f, np.float64).tolist(),
            "probe_labels": np.asarray(probe_l).tolist(),
        }
    ),
    flush=True,
)
