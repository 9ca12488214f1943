"""ctypes bindings for the native (C++) batch sampler.

Builds native/libkge_native.so on first use if the toolchain is available;
falls back cleanly (callers check `available()`).  The native sampler is the
counterpart of the reference's C++ DGL EdgeSampler and exists because at
>40M triples/s device throughput the vectorized-numpy host generator
becomes the pipeline bottleneck on small hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libkge_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        srcs = [os.path.join(_NATIVE_DIR, f)
                for f in ("kge_sampler.cpp", "ldg_partition.cpp")]
        stale = (os.path.exists(_SO_PATH)
                 and any(os.path.exists(s)
                         and os.path.getmtime(s) > os.path.getmtime(_SO_PATH)
                         for s in srcs))
        if not os.path.exists(_SO_PATH) or stale:
            if not os.path.exists(srcs[0]):
                _build_failed = True
                return None
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        try:
            _bind(lib)
        except AttributeError:
            # .so predates a symbol in the current ABI (stale build the
            # mtime check could not catch, e.g. restored from a build
            # cache newer than the sources): force ONE clean rebuild.
            # dlopen caches by PATHNAME (the stale handle is never
            # dlclosed), so re-opening _SO_PATH would return the old
            # mapping — load the rebuilt library through a unique temp
            # path instead (the mapping survives the unlink).
            try:
                os.remove(_SO_PATH)
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
                import shutil
                import tempfile
                fd, fresh = tempfile.mkstemp(suffix=".so",
                                             prefix="kge_native_")
                os.close(fd)
                try:
                    shutil.copy(_SO_PATH, fresh)
                    lib = ctypes.CDLL(fresh)
                    _bind(lib)
                finally:
                    os.unlink(fresh)
            except Exception:
                _build_failed = True
                return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    """Declare the C ABI; raises AttributeError on a stale .so missing a
    symbol (handled in _load)."""
    lib.kge_sampler_create.restype = ctypes.c_void_p
    lib.kge_sampler_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64, ctypes.c_int,
    ]
    lib.kge_sampler_superbatch.restype = None
    lib.kge_sampler_superbatch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
    lib.kge_sampler_superbatch_idx.restype = None
    lib.kge_sampler_superbatch_idx.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.kge_sampler_destroy.restype = None
    lib.kge_sampler_destroy.argtypes = [ctypes.c_void_p]
    lib.kge_ldg_partition.restype = ctypes.c_int64
    lib.kge_ldg_partition.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
        ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def ldg_partition_native(h: np.ndarray, t: np.ndarray, n_nodes: int,
                         k: int, seed: int = 0):
    """C++ LDG node streaming (see native/ldg_partition.cpp).

    Returns (assign [n_nodes] int32, edge_cut).  Raises RuntimeError when
    the native library is unavailable — callers fall back to the numpy
    implementation in partition_graph.py.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native partitioner not available")
    h64 = np.ascontiguousarray(h, np.int64)
    t64 = np.ascontiguousarray(t, np.int64)
    assign = np.empty(n_nodes, np.int32)
    cut = lib.kge_ldg_partition(h64.ctypes.data, t64.ctypes.data,
                                len(h64), n_nodes, k, seed,
                                assign.ctypes.data)
    if cut < 0:
        raise ValueError(
            "ldg_partition: invalid inputs (node id out of [0, n_nodes) "
            f"or k <= 0; n_nodes={n_nodes}, k={k})")
    return assign, int(cut)


class NativeSuperbatchSampler:
    """Drop-in replacement for SuperbatchSampler backed by the C++ core.

    Semantics match (shuffled positives without replacement per epoch,
    uniform corrupted negatives, even rows head-corrupt / odd rows
    tail-corrupt) but the RNG stream differs from numpy's.
    """

    def __init__(self, h: np.ndarray, r: np.ndarray, t: np.ndarray,
                 n_entities: int, batch_size: int, neg_total: int,
                 steps_per_call: int, seed: int = 0,
                 n_threads: Optional[int] = None,
                 impts: Optional[np.ndarray] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native sampler not available")
        assert steps_per_call % 2 == 0
        self._lib = lib
        # keep contiguous int32 copies alive for the lifetime of the handle
        self._h = np.ascontiguousarray(h, np.int32)
        self._r = np.ascontiguousarray(r, np.int32)
        self._t = np.ascontiguousarray(t, np.int32)
        # edge-importance plane: the C core emits the sampled edge indices
        # and the [S, B] weights are gathered here (one vectorized take)
        self._impts = (np.ascontiguousarray(impts, np.float32)
                       if impts is not None else None)
        if self._impts is not None:
            assert len(self._impts) == len(self._h)
        self.batch_size = batch_size
        self.neg_total = neg_total
        self.s = steps_per_call
        self.row_len = 3 * batch_size + neg_total
        if n_threads is None:
            n_threads = max(1, (os.cpu_count() or 2))
        self._handle = lib.kge_sampler_create(
            self._h.ctypes.data, self._r.ctypes.data, self._t.ctypes.data,
            len(self._h), n_entities, batch_size, neg_total, seed,
            max(1, int(n_threads)))
        if not self._handle:
            raise ValueError(
                "kge_sampler_create rejected its arguments (empty edge "
                "list, > INT32_MAX edges, or non-positive sizes)")

    def __iter__(self):
        return self

    def __next__(self):
        out = np.empty((self.s, self.row_len), np.int32)
        if self._impts is None:
            self._lib.kge_sampler_superbatch(self._handle, self.s,
                                             out.ctypes.data)
            return {"packed": out, "impts": None, "n_steps": self.s}
        idx = np.empty((self.s, self.batch_size), np.int32)
        self._lib.kge_sampler_superbatch_idx(self._handle, self.s,
                                             out.ctypes.data,
                                             idx.ctypes.data)
        return {"packed": out, "impts": self._impts[idx],
                "n_steps": self.s}

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.kge_sampler_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
