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

from mh_common import run_training  # noqa: E402  (tests dir on sys.path)

from gm3d_tpu.parallel.multihost import gather_features, is_main_process  # noqa: E402

losses = run_training()

# exercise the eval-side gather: each process contributes a distinct block
feats = np.full((4, 8), float(pid + 1), np.float32)
labels = np.full((4,), pid, np.int64)
gf, gl = gather_features(feats, labels)

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
        }
    ),
    flush=True,
)
