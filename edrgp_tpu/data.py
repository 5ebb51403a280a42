"""Dataset IO and minibatch streaming (native C++ fast path + NumPy
fallback).

The large-N SVGP pipeline: datasets live on disk in a flat float32 format,
are memory-mapped by the native loader (``native/dataloader.cpp``), and a
producer thread gathers shuffled minibatches into reusable buffers so host
batch assembly overlaps device compute.  Falls back to a pure-NumPy
implementation when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import struct
import threading
import queue as _queue
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["write_dataset", "MMapDataset", "native_available",
           "build_native"]

_MAGIC = b"EDRG"
_VERSION = 1
_HEADER = struct.Struct("<4sIqq")  # magic, version, n_rows, row_floats

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libedrgp_data.so"))

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.edr_open.restype = ctypes.c_void_p
    lib.edr_open.argtypes = [ctypes.c_char_p]
    lib.edr_n_rows.restype = ctypes.c_int64
    lib.edr_n_rows.argtypes = [ctypes.c_void_p]
    lib.edr_row_floats.restype = ctypes.c_int64
    lib.edr_row_floats.argtypes = [ctypes.c_void_p]
    lib.edr_start_stream.restype = ctypes.c_int
    lib.edr_start_stream.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int, ctypes.c_uint64,
                                     ctypes.c_int]
    lib.edr_next_batch.restype = ctypes.c_int
    lib.edr_next_batch.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.edr_close.restype = None
    lib.edr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def build_native() -> bool:
    """Compile the shared library in-place; returns success."""
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return native_available()


def write_dataset(path: str, X: np.ndarray, y: np.ndarray) -> None:
    """Write (X [N,Q], y [N]) as one row-major float32 file of [N, Q+1]."""
    X = np.ascontiguousarray(X, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32).reshape(-1, 1)
    if X.shape[0] != y.shape[0]:
        raise ValueError("X and y row counts differ")
    rows = np.concatenate([X, y], axis=1)
    with open(path, "wb") as f:
        f.write(_HEADER.pack(_MAGIC, _VERSION, rows.shape[0], rows.shape[1]))
        rows.tofile(f)


class MMapDataset:
    """Memory-mapped dataset with a background minibatch stream.

    >>> ds = MMapDataset("train.edrg")
    >>> for X_b, y_b in ds.batches(batch_size=4096, seed=0):
    ...     step(X_b, y_b)
    """

    def __init__(self, path: str, force_numpy: bool = False):
        self.path = path
        self._lib = None if force_numpy else _load_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.edr_open(path.encode())
            if not self._handle:
                raise OSError(f"native loader rejected {path!r}")
            self.n_rows = int(self._lib.edr_n_rows(self._handle))
            self.row_floats = int(self._lib.edr_row_floats(self._handle))
        else:
            with open(path, "rb") as f:
                raw = f.read(_HEADER.size)
            if len(raw) < _HEADER.size:
                raise OSError(f"bad dataset header in {path!r}")
            magic, version, n, rf = _HEADER.unpack(raw)
            if magic != _MAGIC or version != _VERSION:
                raise OSError(f"bad dataset header in {path!r}")
            self.n_rows, self.row_floats = int(n), int(rf)
            self._mm = np.memmap(path, dtype=np.float32, mode="r",
                                 offset=_HEADER.size,
                                 shape=(self.n_rows, self.row_floats))
        self.n_features = self.row_floats - 1

    # ---------------------------------------------------------------- rows
    def read_rows(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._handle is not None:
            # random reads go through a throwaway numpy memmap view — the
            # native stream path below is the hot one.
            mm = np.memmap(self.path, dtype=np.float32, mode="r",
                           offset=_HEADER.size,
                           shape=(self.n_rows, self.row_floats))
            rows = np.asarray(mm[idx])
        else:
            rows = np.asarray(self._mm[idx])
        return rows[:, :-1], rows[:, -1]

    # ------------------------------------------------------------- batches
    def batches(self, batch_size: int, seed: int = 0,
                with_replacement: bool = True,
                n_buffers: int = 4) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite stream of (X_b, y_b) minibatches (overlapped gather)."""
        if self._handle is not None:
            rc = self._lib.edr_start_stream(
                self._handle, batch_size, int(with_replacement), seed,
                n_buffers)
            if rc == -1:
                # one stream per native handle — open a fresh mapping of
                # the same file for additional concurrent streams
                fresh = MMapDataset(self.path)
                yield from fresh.batches(batch_size, seed,
                                         with_replacement, n_buffers)
                return
            if rc != 0:
                raise RuntimeError(f"edr_start_stream failed: {rc}")
            buf = np.empty((batch_size, self.row_floats), dtype=np.float32)
            ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            while True:
                self._lib.edr_next_batch(self._handle, ptr)
                rows = buf.copy()
                yield rows[:, :-1], rows[:, -1]
        else:
            yield from self._numpy_batches(batch_size, seed,
                                           with_replacement, n_buffers)

    def _numpy_batches(self, batch_size, seed, with_replacement, n_buffers):
        """Fallback with the same overlap structure (producer thread)."""
        rng = np.random.default_rng(seed)
        q: _queue.Queue = _queue.Queue(maxsize=n_buffers)
        stop = threading.Event()

        def produce():
            perm = None
            cursor = 0
            while not stop.is_set():
                if with_replacement:
                    idx = rng.integers(0, self.n_rows, batch_size)
                else:
                    if perm is None or cursor + batch_size > self.n_rows:
                        perm = rng.permutation(self.n_rows)
                        cursor = 0
                    idx = perm[cursor:cursor + batch_size]
                    cursor += batch_size
                rows = np.asarray(self._mm[np.sort(idx)])
                try:
                    q.put(rows, timeout=1.0)
                except _queue.Full:
                    continue

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                rows = q.get()
                yield rows[:, :-1], rows[:, -1]
        finally:
            stop.set()

    def close(self):
        if self._handle is not None:
            self._lib.edr_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
