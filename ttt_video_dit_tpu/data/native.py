"""ctypes binding + lazy build of the native .npy/.npz prefetch loader.

The C++ source lives in ``_native/npy_loader.cpp`` and is compiled once with
the system ``g++`` into the user cache dir (no pybind11 in the image; plain
``extern "C"`` + ctypes). Everything here degrades gracefully: if the
toolchain or compile is unavailable, ``available()`` returns False and the
data pipeline stays on the pure-Python path (which is also the reference's
behavior — its loader is Python/torch, reference:
ttt/datasets/preembedding_dataset.py).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

_DTYPES = {
    0: np.float32,
    1: np.float16,
    2: np.float64,
    3: np.int8,
    4: np.int16,
    5: np.int32,
    6: np.int64,
    7: np.uint8,
}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir() -> str:
    return osp.join(osp.expanduser("~"), ".cache", "ttt_video_dit_tpu", "native")


def _build() -> Optional[str]:
    src = osp.join(osp.dirname(__file__), "_native", "npy_loader.cpp")
    out_dir = _cache_dir()
    os.makedirs(out_dir, exist_ok=True)
    so = osp.join(out_dir, "npy_loader.so")
    if osp.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", so + ".tmp", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return so
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.nl_pool_create.restype = ctypes.c_void_p
        lib.nl_pool_create.argtypes = [ctypes.c_int]
        lib.nl_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.nl_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p]
        wait_args = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nl_wait.argtypes = [wait_args[0], ctypes.c_int64] + wait_args[1:]
        lib.nl_wait.restype = ctypes.c_int
        lib.nl_load.argtypes = [ctypes.c_char_p] + wait_args[1:]
        lib.nl_load.restype = ctypes.c_int
        lib.nl_free.argtypes = [ctypes.c_void_p]
        lib.nl_pt_dict_open.restype = ctypes.c_void_p
        lib.nl_pt_dict_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nl_pt_dict_name.restype = ctypes.c_char_p
        lib.nl_pt_dict_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.nl_pt_dict_get.argtypes = [ctypes.c_void_p, ctypes.c_int32] + wait_args[1:]
        lib.nl_pt_dict_get.restype = ctypes.c_int
        lib.nl_pt_dict_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _to_array(lib, data, shape, ndim, dtype) -> np.ndarray:
    """Zero-copy wrap of the loader's malloc'd payload: the ndarray views the
    C buffer directly and a finalizer on the buffer object frees it when the
    last view dies (an extra full memcpy here made the pooled path *slower*
    than np.load on page-cached files — scripts/microbench.py --which loader)."""
    import weakref

    dt = _DTYPES[dtype.value]
    shp = tuple(shape[i] for i in range(ndim.value))
    n = int(np.prod(shp)) if shp else 1
    nbytes = max(n * np.dtype(dt).itemsize, 1)
    buf = (ctypes.c_char * nbytes).from_address(data if isinstance(data, int) else data.value)
    weakref.finalize(buf, lib.nl_free, ctypes.c_void_p(data if isinstance(data, int) else data.value))
    return np.frombuffer(buf, dtype=dt, count=n).reshape(shp)


def load_npy(path: str) -> np.ndarray:
    """Synchronous native array read: bare ``.npy``; the first ``.npy``
    member of a ``.npz`` zip (stored or deflate — same member ``np.load``'s
    first key resolves to); or a torch ``.pt`` zip holding ONE plain CPU
    tensor (torch.save's zip container: data.pkl run through a minimal
    pickle VM + the raw storage member; bf16 widens to f4). Raises if the
    native library is unavailable or the file needs a Python fallback
    (zip64, exotic dtype, dict/list pickles, legacy non-zip .pt)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    data = ctypes.c_void_p()
    shape = (ctypes.c_int64 * 8)()
    ndim, dtype = ctypes.c_int32(), ctypes.c_int32()
    rc = lib.nl_load(path.encode(), ctypes.byref(data), shape, ctypes.byref(ndim), ctypes.byref(dtype))
    if rc != 0:
        raise IOError(f"native npy load failed ({rc}): {path}")
    return _to_array(lib, data, shape, ndim, dtype)


def load_pt_dict(path: str) -> dict:
    """Native read of a dict-of-tensor torch ``.pt`` checkpoint (the
    reference VAE checkpoint format, reference:
    ttt/models/vae/model.py torch.load of a ``state_dict`` mapping).

    Returns ``{dotted_name: np.ndarray}`` with nested dicts flattened by
    ``.``-joining (a root ``{"state_dict": {...}}`` wrapper yields
    ``state_dict.<key>`` names); non-tensor values (step counters, strings,
    ``_metadata``) are dropped. bf16 tensors widen to f32 (numpy has no
    bf16 — bit-exact with ``torch.load().float()``). Raises ``IOError`` when
    the file needs the torch.load fallback (zip64, legacy non-zip .pt,
    exotic storages)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    count, err = ctypes.c_int32(), ctypes.c_int32()
    h = lib.nl_pt_dict_open(path.encode(), ctypes.byref(count), ctypes.byref(err))
    if not h:
        raise IOError(f"native .pt dict open failed ({err.value}): {path}")
    out = {}
    try:
        for i in range(count.value):
            name = lib.nl_pt_dict_name(h, i)
            data = ctypes.c_void_p()
            shape = (ctypes.c_int64 * 8)()
            ndim, dtype = ctypes.c_int32(), ctypes.c_int32()
            rc = lib.nl_pt_dict_get(h, i, ctypes.byref(data), shape, ctypes.byref(ndim), ctypes.byref(dtype))
            if rc != 0:
                raise IOError(f"native .pt dict tensor {name!r} failed ({rc}): {path}")
            out[name.decode()] = _to_array(lib, data, shape, ndim, dtype)
    finally:
        lib.nl_pt_dict_close(h)
    return out


class PrefetchPool:
    """Thread-pool prefetcher over the native loader.

    ``submit(id, path)`` enqueues a read; ``wait(id)`` blocks for and returns
    the decoded numpy array. IO and header parsing run in C++ threads off
    the GIL.
    """

    def __init__(self, num_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._pool = ctypes.c_void_p(lib.nl_pool_create(num_threads))
        self._next_id = 0

    def submit(self, job_id: int, path: str) -> None:
        self._lib.nl_submit(self._pool, job_id, path.encode())

    def fetch(self, path: str) -> int:
        """Submit with an auto-assigned job id (returned; pass to wait)."""
        jid = self._next_id
        self._next_id += 1
        self.submit(jid, path)
        return jid

    def discard(self, job_id: int) -> None:
        """Wait for and drop a job's payload (error-tolerant cleanup)."""
        try:
            self.wait(job_id)
        except IOError:
            pass

    def wait(self, job_id: int) -> np.ndarray:
        data = ctypes.c_void_p()
        shape = (ctypes.c_int64 * 8)()
        ndim, dtype = ctypes.c_int32(), ctypes.c_int32()
        rc = self._lib.nl_wait(
            self._pool, job_id, ctypes.byref(data), shape, ctypes.byref(ndim), ctypes.byref(dtype)
        )
        if rc != 0:
            raise IOError(f"native npy load failed ({rc}) for job {job_id}")
        return _to_array(self._lib, data, shape, ndim, dtype)

    def close(self) -> None:
        if self._pool:
            self._lib.nl_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover - best effort
        try:
            self.close()
        except Exception:
            pass
