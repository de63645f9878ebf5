"""ctypes binding to the native record-store reader (native/record_store.cc).

Falls back transparently to the pure-Python mmap reader when the shared
library hasn't been built; `build_native()` compiles it with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", ".."))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libafter_record_store.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "record_store.cc")


def build_native(force: bool = False) -> Optional[str]:
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    if not os.path.exists(_SRC_PATH):
        return None
    try:
        subprocess.run(["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                        "-o", _LIB_PATH, _SRC_PATH], check=True,
                       capture_output=True)
        return _LIB_PATH
    except Exception:
        return None


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rs_open.restype = ctypes.c_void_p
    lib.rs_open.argtypes = [ctypes.c_char_p]
    lib.rs_count.restype = ctypes.c_int64
    lib.rs_count.argtypes = [ctypes.c_void_p]
    lib.rs_key.restype = ctypes.c_char_p
    lib.rs_key.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.rs_get.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rs_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.POINTER(ctypes.c_uint64)]
    lib.rs_get_index.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rs_get_index.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_uint64)]
    lib.rs_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeRecordReader:
    """Same interface as store.RecordReader, backed by the C++ mmap reader."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native record store library unavailable")
        self._lib = lib
        self._h = lib.rs_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)
        self._keys = None

    def keys(self) -> List[str]:
        if self._keys is None:
            n = self._lib.rs_count(self._h)
            self._keys = [self._lib.rs_key(self._h, i).decode()
                          for i in range(n)]
        return list(self._keys)

    def __len__(self) -> int:
        return int(self._lib.rs_count(self._h))

    def get(self, key: str) -> bytes:
        ln = ctypes.c_uint64()
        ptr = self._lib.rs_get(self._h, key.encode(), ctypes.byref(ln))
        if not ptr:
            raise KeyError(key)
        return ctypes.string_at(ptr, ln.value)

    def get_index(self, i: int) -> bytes:
        ln = ctypes.c_uint64()
        ptr = self._lib.rs_get_index(self._h, i, ctypes.byref(ln))
        if not ptr:
            raise IndexError(i)
        return ctypes.string_at(ptr, ln.value)

    def items(self):
        for k in self.keys():
            yield k, self.get(k)

    def close(self):
        if self._h:
            self._lib.rs_close(self._h)
            self._h = None


def open_reader(path: str):
    """Native reader when buildable, Python fallback otherwise."""
    try:
        return NativeRecordReader(path)
    except Exception:
        from .store import RecordReader
        return RecordReader(path)
