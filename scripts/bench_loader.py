"""Host data-pipeline benchmark: native C++ loader vs the Python DataLoader.

The device consumes ~1600 clouds/s in GM3D pretrain (docs/BENCHMARKS.md), so
the host pipeline must sustain comfortably more than that for IO never to be
the bottleneck (the reference leans on torch DataLoader workers for the same
reason, tools/builder.py:14-31). This script builds a synthetic ShapeNet-style
tree of .npy clouds in /tmp and measures end-to-end host throughput —
read + random-subsample to npoints + unit-sphere normalise + batch — for:

  - gm3d_tpu.data.datasets.DataLoader over ShapeNet55 (0 and 8 workers)
  - gm3d_tpu.native.NativeCloudLoader (C++ worker threads, ring buffer)

Pure host benchmark: no jax, no TPU contention. Run from the repo root:
    python scripts/bench_loader.py [--files 2048] [--rows 8192] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tree(root: str, n_files: int, rows: int, seed: int = 0) -> None:
    pc_path = os.path.join(root, "pc")
    os.makedirs(pc_path, exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_files):
        name = f"02691156-model{i:05d}.npy"
        np.save(os.path.join(pc_path, name),
                rng.standard_normal((rows, 3)).astype(np.float32))
        names.append(name)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def time_epochs(iterator_factory, epochs: int) -> tuple[float, int]:
    """Returns (seconds, clouds) over ``epochs`` full passes."""
    clouds = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in iterator_factory():
            arr = b if isinstance(b, np.ndarray) else b[0]
            clouds += arr.shape[0]
    return time.perf_counter() - t0, clouds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=2048)
    ap.add_argument("--rows", type=int, default=8192, help="points per .npy cloud")
    ap.add_argument("--npoints", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/gm3d_loader_bench")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "train.txt")):
        print(f"building {args.files} x ({args.rows},3) synthetic tree at {args.root}")
        build_tree(args.root, args.files, args.rows)
    args.batch = min(args.batch, args.files)  # drop_last needs >= one batch

    from gm3d_tpu.data.datasets import DataLoader, ShapeNet55

    cfg = {"_base_": {"DATA_PATH": args.root, "PC_PATH": os.path.join(args.root, "pc")},
           "others": {"subset": "train", "npoints": args.npoints}}
    ds = ShapeNet55(cfg)
    results = {}

    for workers in (0, 8):
        loader = DataLoader(ds, args.batch, shuffle=True, num_workers=workers)
        # warm one batch (thread-pool spin-up, page cache)
        next(iter(loader))
        secs, clouds = time_epochs(lambda: iter(loader), args.epochs)
        results[f"python_w{workers}"] = clouds / secs

    from gm3d_tpu.native import NativeCloudLoader, native_available

    if native_available():
        paths = [os.path.join(args.root, "pc", f) for _, _, f in ds.file_list]

        def native_iter():
            return iter(loader_n)

        loader_n = NativeCloudLoader(paths, args.npoints, args.batch, num_workers=8)
        # workers start prefetching at construction; give the ring buffer a
        # beat (consuming a batch to warm would eat single-batch epochs)
        time.sleep(0.3)
        secs, clouds = time_epochs(native_iter, args.epochs)
        results["native_w8"] = clouds / secs
        loader_n.close()
    else:
        print("native loader unavailable (no toolchain); skipping")

    for k, v in results.items():
        print(json.dumps({"pipeline": k, "clouds_per_sec": round(v, 1),
                          "batch": args.batch, "npoints": args.npoints,
                          "rows": args.rows, "files": args.files}))
    if not args.keep:
        shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
