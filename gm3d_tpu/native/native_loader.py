"""ctypes binding for the C++ threaded cloud loader (loader.cpp).

Builds ``libgm3dio.so`` on first use (make) and falls back gracefully when no
toolchain is available — callers should check ``native_available()`` and use
the Python ``DataLoader`` otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgm3dio.so")
_lib: Optional[ctypes.CDLL] = None


def _build(force: bool = False) -> bool:
    try:
        cmd = ["make", "-C", _DIR] + (["-B"] if force else [])
        subprocess.run(cmd, check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.gm3d_loader_create.restype = ctypes.c_void_p
    lib.gm3d_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint,
        ctypes.c_int,
    ]
    lib.gm3d_loader_next.restype = ctypes.c_int
    lib.gm3d_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.gm3d_labelled_loader_create.restype = ctypes.c_void_p
    lib.gm3d_labelled_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gm3d_loader_next_labelled.restype = ctypes.c_int
    lib.gm3d_loader_next_labelled.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gm3d_loader_num_batches.restype = ctypes.c_int
    lib.gm3d_loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.gm3d_loader_error_count.restype = ctypes.c_long
    lib.gm3d_loader_error_count.argtypes = [ctypes.c_void_p]
    lib.gm3d_loader_set_epoch.restype = None
    lib.gm3d_loader_set_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gm3d_loader_epoch.restype = ctypes.c_int
    lib.gm3d_loader_epoch.argtypes = [ctypes.c_void_p]
    lib.gm3d_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    # incremental make first: a stale .so built from an older loader.cpp
    # survives on disk (build artifact), and binding would AttributeError on
    # the newer symbols — make's dependency on loader.cpp rebuilds it
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        _lib = _bind(ctypes.CDLL(_LIB_PATH))
    except (OSError, AttributeError):
        # stale/corrupt library that make considered up-to-date (e.g. clock
        # skew): force a full rebuild once, then give up gracefully
        if not _build(force=True):
            return None
        try:
            _lib = _bind(ctypes.CDLL(_LIB_PATH))
        except (OSError, AttributeError):
            return None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _check_loader_errors(loader):
    """Raise when workers skipped unreadable/invalid files: a silent skip
    would shorten the epoch while __len__ still counts every path, skewing
    steps_per_epoch-derived schedules and hiding data loss."""
    n = int(loader._lib.gm3d_loader_error_count(loader._handle))
    if n > getattr(loader, "_errors_seen", 0):
        loader._errors_seen = n
        raise RuntimeError(
            f"native loader: {n} file(s) unreadable or invalid this run — "
            "fix or remove them (the torch reference would crash on the "
            "first one; a silent skip would shorten epochs invisibly)")


class _EpochControl:
    """Resume contract shared with the Python DataLoader: the shuffle order
    is f(seed, epoch), so restoring the epoch restores the sequence. The CLIs
    call ``load_state({"epoch": e, "batch": 0})`` on ``--resume``
    (``cli/pretrain.py``) — without this the native path silently replayed
    epoch-0 order after resume. Mid-epoch positions are not restored (the
    CLIs checkpoint at epoch boundaries; see ``data/prefetch.py``)."""

    @property
    def epoch(self) -> int:
        return int(self._lib.gm3d_loader_epoch(self._handle))

    def set_epoch(self, epoch: int) -> None:
        self._lib.gm3d_loader_set_epoch(self._handle, int(epoch))

    def state(self) -> dict:
        return {"epoch": self.epoch, "batch": 0}

    def load_state(self, state: dict) -> None:
        self.set_epoch(int(state.get("epoch", 0)))


class NativeCloudLoader(_EpochControl):
    """Iterates (batch_size, npoints, 3) float32 batches read, subsampled and
    unit-sphere-normalised by C++ worker threads."""

    def _check_errors(self):
        _check_loader_errors(self)

    def __init__(
        self,
        paths: List[str],
        npoints: int,
        batch_size: int,
        num_workers: int = 4,
        seed: int = 0,
        shuffle: bool = True,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no toolchain?)")
        self._lib = lib
        self.npoints = npoints
        self.batch_size = batch_size
        # 0 workers would leave next() waiting forever (no producer)
        num_workers = max(1, int(num_workers))
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.gm3d_loader_create(
            arr, len(paths), npoints, batch_size, num_workers, seed, int(shuffle)
        )
        self._buf = np.empty((batch_size, npoints, 3), np.float32)

    def __len__(self):
        return self._lib.gm3d_loader_num_batches(self._handle)

    def __iter__(self):
        while True:
            ok = self._lib.gm3d_loader_next(
                self._handle, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if ok == 0:
                self._check_errors()
                return
            yield self._buf.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.gm3d_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeLabelledCloudLoader(_EpochControl):
    """Labelled variant: yields ``(pts, cls)`` — or ``(pts, cls, seg)`` with
    ``with_seg=True`` — batches assembled by the C++ worker threads. The class
    label travels with each sample through the ring buffer (Sample struct in
    loader.cpp), so worker completion order cannot mis-pair them. With
    ``with_seg`` the last npy column is returned as per-point int32 part ids
    (the ShapeNetPart ``.npy`` caches are (N, 7) ``x y z nx ny nz part``)."""

    def _check_errors(self):
        _check_loader_errors(self)

    def __init__(
        self,
        paths: List[str],
        labels: List[int],
        npoints: int,
        batch_size: int,
        num_workers: int = 4,
        seed: int = 0,
        shuffle: bool = True,
        with_seg: bool = False,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no toolchain?)")
        assert len(paths) == len(labels)
        self._lib = lib
        self.npoints = npoints
        self.batch_size = batch_size
        self.with_seg = with_seg
        num_workers = max(1, int(num_workers))  # 0 workers = no producer
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        lbl = np.asarray(labels, np.int32)
        self._handle = lib.gm3d_labelled_loader_create(
            arr, lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(paths),
            npoints, batch_size, num_workers, seed, int(shuffle), int(with_seg)
        )
        self._pts = np.empty((batch_size, npoints, 3), np.float32)
        self._cls = np.empty((batch_size,), np.int32)
        self._seg = np.empty((batch_size, npoints), np.int32)

    def __len__(self):
        return self._lib.gm3d_loader_num_batches(self._handle)

    def __iter__(self):
        while True:
            ok = self._lib.gm3d_loader_next_labelled(
                self._handle,
                self._pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if ok == 0:
                self._check_errors()
                return
            if self.with_seg:
                yield self._pts.copy(), self._cls.copy(), self._seg.copy()
            else:
                yield self._pts.copy(), self._cls.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.gm3d_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
