"""ctypes binding for the native IO library (native/lmdb_lite.cc).

``open_reader(path)`` returns a NativeReader when libmaskdit_io.so is
available (building it on first use if a toolchain exists), else the
pure-Python lmdb_lite.Reader. Both expose get()/__len__/close().
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmaskdit_io.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.mdbl_open.restype = ctypes.c_void_p
        lib.mdbl_open.argtypes = [ctypes.c_char_p]
        lib.mdbl_close.argtypes = [ctypes.c_void_p]
        lib.mdbl_entries.restype = ctypes.c_int64
        lib.mdbl_entries.argtypes = [ctypes.c_void_p]
        lib.mdbl_get.restype = ctypes.c_int
        lib.mdbl_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


class NativeReader:
    """LMDB reader backed by the C++ mmap implementation."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise OSError("libmaskdit_io.so unavailable")
        self._lib = lib
        self._h = lib.mdbl_open(os.fsencode(path))
        if not self._h:
            raise IOError(f"{path}: not an LMDB data file")
        self.entries = lib.mdbl_entries(self._h)

    def get(self, key: bytes) -> Optional[bytes]:
        if isinstance(key, str):
            key = key.encode("utf-8")
        val = ctypes.c_void_p()
        vlen = ctypes.c_size_t()
        rc = self._lib.mdbl_get(
            self._h, key, len(key), ctypes.byref(val), ctypes.byref(vlen)
        )
        if rc != 0:
            return None
        return ctypes.string_at(val.value, vlen.value)

    def __len__(self) -> int:
        return int(self.entries)

    def close(self) -> None:
        if self._h:
            self._lib.mdbl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_reader(path: str):
    """Best reader available: native mmap if buildable, else pure Python."""
    if _load_lib() is not None:
        try:
            return NativeReader(path)
        except OSError:
            pass
    from maskdit_tpu.data import lmdb_lite

    return lmdb_lite.Reader(path)
