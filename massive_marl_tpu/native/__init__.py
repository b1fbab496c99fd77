"""ctypes bindings for the native runtime libraries.

  mmtio.cc    - mmap'd float32 .npy dataset IO (write / zero-copy read /
                row gather) for the offline-RL data path
  tbevents.cc - TensorBoard event-file writer (TFRecord framing + masked
                CRC32C + hand-encoded Event protos) for the metrics path

Each builds lazily with g++ on first use; every caller has a pure-Python
fallback when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmmtio.so")
_lib = None


def _build_lib(src: str, so_path: str) -> bool:
    """Compile one .cc into a shared lib if missing or stale."""
    src_path = os.path.join(_HERE, src)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src_path):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so_path, src_path],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _build_lib("mmtio.cc", _SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.mmtio_write_npy.restype = ctypes.c_int
    lib.mmtio_write_npy.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64, ctypes.c_int64]
    lib.mmtio_open_npy.restype = ctypes.c_void_p
    lib.mmtio_open_npy.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.mmtio_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.mmtio_data.argtypes = [ctypes.c_void_p]
    lib.mmtio_gather_rows.restype = ctypes.c_int
    lib.mmtio_gather_rows.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                                      ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.mmtio_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_npy(path: str, arr: np.ndarray) -> None:
    """Native .npy writer (numpy fallback if the lib is unavailable)."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    lib = get_lib()
    if lib is None:
        np.save(path if path.endswith(".npy") else path + ".npy", arr)
        return
    rc = lib.mmtio_write_npy(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.shape[0], arr.shape[1])
    if rc != 0:
        raise IOError(f"mmtio_write_npy failed rc={rc} for {path}")


class NpyMmap:
    """Zero-copy mmap'd float32 .npy reader with native row gather."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            self._np = np.load(path, mmap_mode="r")
            self._h = None
            self.shape = self._np.shape
            return
        r = ctypes.c_int64()
        c = ctypes.c_int64()
        self._h = lib.mmtio_open_npy(path.encode(), ctypes.byref(r), ctypes.byref(c))
        if not self._h:
            raise IOError(f"mmtio_open_npy failed for {path}")
        self._lib = lib
        self.shape = (r.value, c.value)
        self._np = None

    def as_array(self) -> np.ndarray:
        if self._np is not None:
            return np.asarray(self._np)
        n = self.shape[0] * self.shape[1]
        buf = np.ctypeslib.as_array(self._lib.mmtio_data(self._h), shape=(n,))
        return buf.reshape(self.shape)

    def gather(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        if self._np is not None or self._h is None:
            return np.asarray(self.as_array()[idx])
        out = np.empty((len(idx), self.shape[1]), np.float32)
        rc = self._lib.mmtio_gather_rows(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IOError(f"mmtio_gather_rows rc={rc}")
        return out

    def close(self):
        if self._h is not None:
            self._lib.mmtio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# --------------------------------------------------------------- tbevents
_TB_SO = os.path.join(_HERE, "libtbevents.so")
_tb_lib = None


def get_tb_lib():
    global _tb_lib
    if _tb_lib is not None:
        return _tb_lib
    if not _build_lib("tbevents.cc", _TB_SO):
        return None
    lib = ctypes.CDLL(_TB_SO)
    lib.tb_open.restype = ctypes.c_void_p
    lib.tb_open.argtypes = [ctypes.c_char_p, ctypes.c_double]
    lib.tb_scalar.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_float,
                              ctypes.c_longlong, ctypes.c_double]
    lib.tb_flush.argtypes = [ctypes.c_void_p]
    lib.tb_close.argtypes = [ctypes.c_void_p]
    _tb_lib = lib
    return lib


class TBEventWriter:
    """Native tfevents scalar writer (tbevents.cc).

    Drop-in for the SummaryWriter.add_scalar subset the framework uses;
    files are readable by TensorBoard and utils/logger/tools.read_tfevents.
    Raises RuntimeError when the native toolchain is unavailable - callers
    (utils/logging.Writer) fall back to torch's SummaryWriter.
    """

    def __init__(self, log_dir: str):
        import socket
        import time
        lib = get_tb_lib()
        if lib is None:
            raise RuntimeError("native tbevents lib unavailable")
        os.makedirs(log_dir, exist_ok=True)
        now = time.time()
        host = socket.gethostname()
        self.path = os.path.join(
            log_dir, f"events.out.tfevents.{int(now)}.{host}.{os.getpid()}")
        self._lib = lib
        self._h = lib.tb_open(self.path.encode(), now)
        if not self._h:
            raise RuntimeError(f"tb_open failed for {self.path}")

    def add_scalar(self, tag: str, value: float, step: int, wall_time: float | None = None):
        import time
        self._lib.tb_scalar(self._h, tag.encode(), float(value), int(step),
                            time.time() if wall_time is None else wall_time)

    def flush(self):
        if self._h:
            self._lib.tb_flush(self._h)

    def close(self):
        if self._h:
            self._lib.tb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
