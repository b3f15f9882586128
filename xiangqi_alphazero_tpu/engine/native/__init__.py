"""ctypes loader for the native host-side rules core (xq_core.cpp).

Auto-builds with g++ on first import (cached .so next to the source) and
degrades gracefully to the pure-Python oracle when no compiler is present —
the same auto-detect-with-fallback contract as the reference's Cython loader
(reference: training/game.py:31-47).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "xq_core.cpp")
_SO = os.path.join(_DIR, "libxq_core.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native engine build failed (%s); using Python rules", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        logger.warning("native engine load failed (%s)", e)
        return None
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.xq_find_king.argtypes = [i8p, ctypes.c_int]
    lib.xq_find_king.restype = ctypes.c_int
    lib.xq_is_attacked.argtypes = [i8p, ctypes.c_int, ctypes.c_int]
    lib.xq_is_attacked.restype = ctypes.c_int
    lib.xq_is_in_check.argtypes = [i8p, ctypes.c_int]
    lib.xq_is_in_check.restype = ctypes.c_int
    lib.xq_gen_legal.argtypes = [i8p, ctypes.c_int, i32p, ctypes.c_int]
    lib.xq_gen_legal.restype = ctypes.c_int
    lib.xq_has_legal.argtypes = [i8p, ctypes.c_int]
    lib.xq_has_legal.restype = ctypes.c_int
    lib.xq_minimax_move.argtypes = [
        i8p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.xq_minimax_move.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def gen_legal(board: np.ndarray, side: int) -> List[int]:
    """Legal actions (ascending). board: int8[90]."""
    lib = load()
    assert lib is not None
    out = np.empty(128, np.int32)
    n = lib.xq_gen_legal(np.ascontiguousarray(board, np.int8), side, out, 128)
    return out[:n].tolist()


def is_in_check(board: np.ndarray, side: int) -> bool:
    lib = load()
    assert lib is not None
    return bool(lib.xq_is_in_check(np.ascontiguousarray(board, np.int8), side))


def is_attacked(board: np.ndarray, sq: int, by: int) -> bool:
    lib = load()
    assert lib is not None
    return bool(lib.xq_is_attacked(np.ascontiguousarray(board, np.int8), sq, by))


def find_king(board: np.ndarray, side: int) -> Optional[int]:
    lib = load()
    assert lib is not None
    k = lib.xq_find_king(np.ascontiguousarray(board, np.int8), side)
    return None if k < 0 else int(k)


def has_legal(board: np.ndarray, side: int) -> bool:
    lib = load()
    assert lib is not None
    return bool(lib.xq_has_legal(np.ascontiguousarray(board, np.int8), side))


def minimax_move(board: np.ndarray, side: int, depth: int,
                 seed: int = 1) -> Optional[int]:
    """Alpha-beta minimax action (from*90+to), the external Elo anchor
    opponent — semantics of serve/static/engine.js minimaxMove (reference:
    web/client/src/lib/xiangqi-engine.ts:292-357). None if no legal move."""
    lib = load()
    assert lib is not None
    a = int(lib.xq_minimax_move(
        np.ascontiguousarray(board, np.int8), side, depth,
        ctypes.c_uint64(seed & (2**64 - 1)),
    ))
    return None if a < 0 else a
