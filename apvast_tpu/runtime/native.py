"""ctypes bindings for the native real-time runtime (native/apvast_rt.cpp).

The shared library is built on demand with the system compiler (no
pybind11 / build-system dependency); the result is cached next to the
source. See the C++ source for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def load_native() -> ctypes.CDLL:
    """Load (building if needed) libapvast_rt.so."""
    global _LIB
    if _LIB is not None:
        return _LIB
    lib_path = os.path.abspath(os.path.join(_NATIVE_DIR, "libapvast_rt.so"))
    src_path = os.path.abspath(os.path.join(_NATIVE_DIR, "apvast_rt.cpp"))
    have_lib = os.path.exists(lib_path)
    have_src = os.path.exists(src_path)
    if not have_lib and not have_src:
        raise FileNotFoundError(
            f"neither {lib_path} nor its source {src_path} exists"
        )
    # A prebuilt library without the source (deployment artifact) loads
    # as-is; rebuild only when the source is present and newer.
    if have_src and (
        not have_lib or os.path.getmtime(src_path) > os.path.getmtime(lib_path)
    ):
        proc = subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", lib_path, src_path],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
            )
    lib = ctypes.CDLL(lib_path)

    u64, ptr, f32p = ctypes.c_uint64, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
    sigs = {
        "apvast_ring_create": ([u64], ptr),
        "apvast_ring_destroy": ([ptr], None),
        "apvast_ring_capacity": ([ptr], u64),
        "apvast_ring_readable": ([ptr], u64),
        "apvast_ring_writable": ([ptr], u64),
        "apvast_ring_write": ([ptr, f32p, u64], u64),
        "apvast_ring_read": ([ptr, f32p, u64], u64),
        "apvast_ring_overruns": ([ptr], u64),
        "apvast_ring_underruns": ([ptr], u64),
        "apvast_framer_create": ([u64, u64], ptr),
        "apvast_framer_destroy": ([ptr], None),
        "apvast_framer_push": ([ptr, f32p, u64], u64),
        "apvast_framer_ready": ([ptr], u64),
        "apvast_framer_pop": ([ptr, f32p], ctypes.c_int),
        "apvast_framer_dropped": ([ptr], u64),
        "apvast_framer_writable": ([ptr], u64),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    _LIB = lib
    return lib


def _as_f32_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class RingBuffer:
    """Lock-free SPSC float ring buffer (audio-callback safe)."""

    def __init__(self, min_capacity: int):
        self._lib = load_native()
        self._handle = self._lib.apvast_ring_create(min_capacity)
        if not self._handle:
            raise MemoryError("ring allocation failed")

    @property
    def capacity(self) -> int:
        return self._lib.apvast_ring_capacity(self._handle)

    @property
    def readable(self) -> int:
        return self._lib.apvast_ring_readable(self._handle)

    @property
    def writable(self) -> int:
        return self._lib.apvast_ring_writable(self._handle)

    @property
    def overruns(self) -> int:
        return self._lib.apvast_ring_overruns(self._handle)

    @property
    def underruns(self) -> int:
        return self._lib.apvast_ring_underruns(self._handle)

    def write(self, samples) -> int:
        arr = np.ascontiguousarray(samples, dtype=np.float32)
        return self._lib.apvast_ring_write(self._handle, _as_f32_ptr(arr), arr.size)

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        got = self._lib.apvast_ring_read(self._handle, _as_f32_ptr(out), n)
        return out[:got]

    def close(self) -> None:
        if self._handle:
            self._lib.apvast_ring_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


class HopFramer:
    """Reframe arbitrary-size chunks into fixed engine hops."""

    def __init__(self, hop: int, max_backlog_hops: int = 8):
        self._lib = load_native()
        self.hop = hop
        self._handle = self._lib.apvast_framer_create(hop, max_backlog_hops)
        if not self._handle:
            raise MemoryError("framer allocation failed")

    def push(self, samples) -> int:
        arr = np.ascontiguousarray(samples, dtype=np.float32)
        return self._lib.apvast_framer_push(self._handle, _as_f32_ptr(arr), arr.size)

    @property
    def ready(self) -> int:
        return self._lib.apvast_framer_ready(self._handle)

    @property
    def dropped(self) -> int:
        return self._lib.apvast_framer_dropped(self._handle)

    @property
    def writable(self) -> int:
        """Free sample capacity (for atomic multi-framer admission)."""
        return self._lib.apvast_framer_writable(self._handle)

    def pop(self) -> np.ndarray | None:
        out = np.empty(self.hop, dtype=np.float32)
        if self._lib.apvast_framer_pop(self._handle, _as_f32_ptr(out)):
            return out
        return None

    def close(self) -> None:
        if self._handle:
            self._lib.apvast_framer_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
