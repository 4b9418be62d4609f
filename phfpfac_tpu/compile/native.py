"""ctypes bindings for the C++ host compiler (_native/pfac_native.cpp).

The reference's host-side hot paths — per-byte trie insertion
(create_table_reorder.c:315-375) and the FFDM first-fit search
(phf.c:184-229) — are native C there; here they are a small C++ library
built on demand with g++ and loaded via ctypes (no pybind11 in the
image).  ``available()`` gates use; the NumPy implementations remain
the portable fallback and the semantics oracle (tests/test_native.py
diffs every table byte-for-byte).

Set PHFPFAC_NO_NATIVE=1 to force the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from phfpfac_tpu.utils.config import CHAR_SET, HASHTABLE_MAX

_DIR = Path(__file__).parent / "_native"
_SRC = _DIR / "pfac_native.cpp"
_SO = _DIR / "libpfac_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL | None:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get("PHFPFAC_NO_NATIVE") == "1":
            _failed = True
            return None
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
            lib.pfac_build_trie.restype = ctypes.c_int64
            lib.pfac_build_trie.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.pfac_ffdm.restype = ctypes.c_int64
            lib.pfac_ffdm.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:  # noqa: BLE001 — fall back to NumPy
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def build_trie_native(patterns: list[bytes]):
    """Native build_pfac_trie core; returns (table, state_num, max_pat_len).

    Caller provides the sorted pattern list.
    """
    lib = _load()
    assert lib is not None
    k = len(patterns)
    blob = np.frombuffer(b"".join(patterns), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(p) for p in patterns]).astype(np.int64)
    cap = k + 2 + int(offsets[-1]) + 1
    table = np.full((cap, CHAR_SET), -1, dtype=np.int32)
    maxlen = np.zeros(1, dtype=np.int32)
    state_num = lib.pfac_build_trie(
        blob.ctypes.data if blob.size else None,
        offsets.ctypes.data,
        k,
        table.ctypes.data,
        cap,
        maxlen.ctypes.data,
    )
    if state_num == -2:
        raise ValueError("empty pattern")
    if state_num < 0:
        raise OverflowError("trie capacity overflow")
    return table[:state_num], int(state_num), int(maxlen[0])


def ffdm_native(table: np.ndarray, width: int, hashtable_max: int = HASHTABLE_MAX):
    """Native FFDM; returns (r, ht, val, stats dict)."""
    lib = _load()
    assert lib is not None
    table = np.ascontiguousarray(table, dtype=np.int32)
    state_num = table.shape[0]
    r_len = (state_num * CHAR_SET) // width + 1
    r = np.empty(r_len, dtype=np.int32)
    ht = np.full(hashtable_max, -1, dtype=np.int32)
    val = np.full(hashtable_max, -1, dtype=np.int32)
    stats = np.zeros(4, dtype=np.int64)
    ht_size = lib.pfac_ffdm(
        table.ctypes.data, state_num, width,
        r.ctypes.data, r_len, ht.ctypes.data, val.ctypes.data,
        hashtable_max, stats.ctypes.data,
    )
    if ht_size < 0:
        raise RuntimeError(
            "failed to fit row into the hash table; "
            "try increasing the hash table size"
        )
    return (
        r,
        ht[:ht_size].copy(),
        val[:ht_size].copy(),
        {
            "num_keys": int(stats[0]),
            "max_key": int(stats[1]),
            "max_offset": int(stats[2]),
            "ht_size": int(stats[3]),
        },
    )
