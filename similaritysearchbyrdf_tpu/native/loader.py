"""ctypes bridge to the native bulk parser (librdf_loader.so).

Builds the shared library on first use if a compiler is available; all
callers fall back to the pure-python parsers when the native path is
unavailable, so the native tier is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "librdf_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_HERE, check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.rdf_parse_dense_file.restype = ctypes.c_void_p
        lib.rdf_parse_dense_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rdf_copy_dense.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.rdf_free_dense.argtypes = [ctypes.c_void_p]
        lib.rdf_parse_sparse_file.restype = ctypes.c_void_p
        lib.rdf_parse_sparse_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rdf_copy_sparse.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.rdf_free_sparse.argtypes = [ctypes.c_void_p]
        # batch wire-format codecs (rdf_codec.cc)
        lib.rdf_encode_dense_batch.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.rdf_encode_dense_batch.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rdf_free_buf.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.rdf_decode_dense_batch.restype = ctypes.c_void_p
        lib.rdf_decode_dense_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rdf_copy_dense_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.rdf_free_dense_batch.argtypes = [ctypes.c_void_p]
        lib.rdf_encode_sparse_batch.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.rdf_encode_sparse_batch.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rdf_decode_sparse_batch.restype = ctypes.c_void_p
        lib.rdf_decode_sparse_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rdf_copy_sparse_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.rdf_free_sparse_batch.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


# ---------------------------------------------------------------------------
# batch wire-format codecs (native; None when unavailable)
# ---------------------------------------------------------------------------


def encode_dense_batch(ids: np.ndarray, values: np.ndarray) -> Optional[bytes]:
    lib = _get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float64)
    n, dim = values.shape
    out_len = ctypes.c_int64()
    p = lib.rdf_encode_dense_batch(ids, values, n, dim,
                                   ctypes.byref(out_len))
    if not p:
        return None
    try:
        return ctypes.string_at(p, out_len.value)
    finally:
        lib.rdf_free_buf(p)


def decode_dense_batch(buf: bytes) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    dim = ctypes.c_int64()
    h = lib.rdf_decode_dense_batch(buf, len(buf), ctypes.byref(n),
                                   ctypes.byref(dim))
    if not h:
        return None
    try:
        ids = np.empty(n.value, dtype=np.int32)
        values = np.empty((n.value, dim.value), dtype=np.float64)
        lib.rdf_copy_dense_batch(h, ids, values)
        return ids, values
    finally:
        lib.rdf_free_dense_batch(h)


def encode_sparse_batch(
    ids: np.ndarray, size: int, idx: np.ndarray, val: np.ndarray,
    nnz: np.ndarray,
) -> Optional[bytes]:
    lib = _get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    val = np.ascontiguousarray(val, dtype=np.float64)
    nnz = np.ascontiguousarray(nnz, dtype=np.int32)
    n, max_nnz = idx.shape
    out_len = ctypes.c_int64()
    p = lib.rdf_encode_sparse_batch(ids, size, idx, val, nnz, n, max_nnz,
                                    ctypes.byref(out_len))
    if not p:
        return None
    try:
        return ctypes.string_at(p, out_len.value)
    finally:
        lib.rdf_free_buf(p)


def decode_sparse_batch(
    buf: bytes,
) -> Optional[Tuple[np.ndarray, int, np.ndarray, np.ndarray, np.ndarray]]:
    lib = _get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    size = ctypes.c_int64()
    max_nnz = ctypes.c_int64()
    h = lib.rdf_decode_sparse_batch(buf, len(buf), ctypes.byref(n),
                                    ctypes.byref(size), ctypes.byref(max_nnz))
    if not h:
        return None
    try:
        ids = np.empty(n.value, dtype=np.int32)
        idx = np.empty((n.value, max_nnz.value), dtype=np.int32)
        val = np.empty((n.value, max_nnz.value), dtype=np.float64)
        nnz = np.empty(n.value, dtype=np.int32)
        lib.rdf_copy_sparse_batch(h, ids, idx.reshape(-1), val.reshape(-1),
                                  nnz)
        return ids, int(size.value), idx, val, nnz
    finally:
        lib.rdf_free_sparse_batch(h)


def load_dense_file(
    path: str, limit: Optional[int] = None
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Returns (ids, values) or None when the native path is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    dim = ctypes.c_int64()
    h = lib.rdf_parse_dense_file(
        path.encode(), ctypes.c_int64(limit or -1),
        ctypes.byref(rows), ctypes.byref(dim),
    )
    if not h:
        return None
    try:
        n, d = rows.value, dim.value
        if n == 0 or d == 0:
            return None
        ids = np.empty(n, dtype=np.int32)
        values = np.empty((n, d), dtype=np.float32)
        lib.rdf_copy_dense(h, ids, values.reshape(-1))
        return ids, values
    finally:
        lib.rdf_free_dense(h)


def load_sparse_file(
    path: str, limit: Optional[int] = None, nnz_pad: Optional[int] = None
) -> Optional[Tuple[np.ndarray, int, np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (ids, size, indices, values, lengths) or None."""
    lib = _get_lib()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    max_nnz = ctypes.c_int64()
    size = ctypes.c_int64()
    h = lib.rdf_parse_sparse_file(
        path.encode(), ctypes.c_int64(limit or -1),
        ctypes.byref(rows), ctypes.byref(max_nnz), ctypes.byref(size),
    )
    if not h:
        return None
    try:
        n = rows.value
        if n == 0:
            return None
        pad = int(nnz_pad or max(1, max_nnz.value))
        if max_nnz.value > pad:
            return None  # caller's pad too small: let python path error out
        ids = np.empty(n, dtype=np.int32)
        idx = np.zeros((n, pad), dtype=np.int32)
        val = np.zeros((n, pad), dtype=np.float32)
        lengths = np.empty(n, dtype=np.int32)
        lib.rdf_copy_sparse(h, ids, idx.reshape(-1), val.reshape(-1), lengths,
                            ctypes.c_int64(pad))
        return ids, int(size.value), idx, val, lengths
    finally:
        lib.rdf_free_sparse(h)
