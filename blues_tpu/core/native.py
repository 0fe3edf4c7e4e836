"""ctypes bindings for the native (C++) I/O runtime.

The compiled library (csrc/amber_io.cpp) accelerates fixed-width Amber
file tokenization ~30-100x over pure Python; everything degrades
gracefully to the Python implementations when no compiler is available.
The library is built on first use with g++ and cached next to the sources.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("blues_tpu.native")

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libamber_io.so"))
_SRC_PATH = os.path.abspath(os.path.join(_CSRC, "amber_io.cpp"))

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_fixed_floats.restype = ctypes.c_int64
        lib.parse_fixed_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.parse_fixed_ints.restype = ctypes.c_int64
        lib.parse_fixed_ints.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception as exc:  # no compiler / load failure -> Python fallback
        logger.debug("native amber_io unavailable (%s); using Python parser", exc)
        _lib = None
    return _lib


def parse_fixed_floats(text: str, width: int) -> np.ndarray | None:
    """Native fixed-width float tokenizer; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode()
    max_out = len(data) // max(width, 1) + 8
    out = np.empty(max_out, np.float64)
    n = lib.parse_fixed_floats(
        data, len(data), width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out
    )
    if n < 0:
        return None
    return out[:n]


def parse_fixed_ints(text: str, width: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode()
    max_out = len(data) // max(width, 1) + 8
    out = np.empty(max_out, np.int64)
    n = lib.parse_fixed_ints(
        data, len(data), width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_out
    )
    if n < 0:
        return None
    return out[:n]
