"""ctypes bindings for the native C++ FASTA codec (io/fasta_codec.cpp).

The shared library is compiled on first use with the system g++ (no build
step, no pip deps) and cached; every entry point degrades gracefully to
``None`` so callers fall back to the pure-numpy path (utils/fasta.py) when
no compiler is available.  Set ``BAMM_NO_NATIVE=1`` to disable.

Parity contract: byte-identical codes/lens/headers vs the Python parser on
every input (asserted in tests/test_native_io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fasta_codec.cpp")


def _cache_dir() -> str:
    d = os.environ.get("BAMM_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "bammmotif2_tpu"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    """Compile the codec to a cached .so; returns the path or None."""
    if not os.path.exists(_SRC):
        return None
    tag = f"py{sys.version_info[0]}{sys.version_info[1]}_{os.path.getmtime(_SRC):.0f}"
    out = os.path.join(_cache_dir(), f"libbamm_fasta_{tag}.so")
    if os.path.exists(out):
        return out
    tmp = tempfile.mktemp(suffix=".so", dir=_cache_dir())
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)  # atomic vs concurrent builders
        return out
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("BAMM_NO_NATIVE"):
            _lib_failed = True
            return None
        path = _build()
        if path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _lib_failed = True
            return None
        i64, i64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i8, i8p = ctypes.c_int8, ctypes.POINTER(ctypes.c_int8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.bamm_fasta_scan.argtypes = [u8p, i64, i64p, i64p]
        lib.bamm_fasta_scan.restype = ctypes.c_int
        lib.bamm_fasta_fill.argtypes = [
            u8p, i64, i8p, i8p, i64, i64, i32p, i64p, i64p, i8,
        ]
        lib.bamm_fasta_fill.restype = i64
        lib.bamm_revcomp_batch.argtypes = [
            i8p, i32p, i64, i64, i8p, i64, i8, i8, i8p,
        ]
        lib.bamm_revcomp_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def read_fasta_encoded(path: str, alphabet=None):
    """Parse + encode a FASTA file natively.

    Returns (codes int8 [N, L_max], lens int32 [N], headers list[str]) or
    None if the native library is unavailable (callers must fall back).
    """
    lib = _load()
    if lib is None:
        return None
    from bammmotif2_tpu.utils.alphabet import Alphabet
    from bammmotif2_tpu.utils.fasta import PAD

    alphabet = alphabet or Alphabet.standard()
    buf = np.fromfile(path, dtype=np.uint8)
    n = np.int64(buf.size)
    if buf.size == 0:
        return np.zeros((0, 0), np.int8), np.zeros(0, np.int32), []
    n_seqs = ctypes.c_int64(0)
    max_len = ctypes.c_int64(0)
    rc = lib.bamm_fasta_scan(
        _ptr(buf, ctypes.c_uint8), n, ctypes.byref(n_seqs), ctypes.byref(max_len)
    )
    if rc != 0:
        return None
    N, L = int(n_seqs.value), int(max_len.value)
    table = alphabet._encode_table()  # int8[256]
    codes = np.empty((max(N, 1), max(L, 1)), np.int8)
    lens = np.zeros(max(N, 1), np.int32)
    hdr_off = np.zeros(max(N, 1), np.int64)
    hdr_len = np.zeros(max(N, 1), np.int64)
    wrote = lib.bamm_fasta_fill(
        _ptr(buf, ctypes.c_uint8), n, _ptr(table, ctypes.c_int8),
        _ptr(codes, ctypes.c_int8), np.int64(N), np.int64(L),
        _ptr(lens, ctypes.c_int32), _ptr(hdr_off, ctypes.c_int64),
        _ptr(hdr_len, ctypes.c_int64), np.int8(PAD),
    )
    if wrote != N:
        return None  # geometry mismatch (file changed underneath) — fall back
    bview = buf.tobytes()
    headers = [
        "unnamed" if off < 0 else bview[off : off + ln].decode("utf-8", "replace")
        for off, ln in zip(hdr_off[:N].tolist(), hdr_len[:N].tolist())
    ]
    return codes[:N, :L], lens[:N], headers


def revcomp_batch(codes: np.ndarray, lens: np.ndarray, comp_table: np.ndarray):
    """Native batch reverse-complement; returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    from bammmotif2_tpu.utils.alphabet import AMBIG
    from bammmotif2_tpu.utils.fasta import PAD

    codes = np.ascontiguousarray(codes, np.int8)
    lens32 = np.ascontiguousarray(lens, np.int32)
    comp = np.ascontiguousarray(comp_table, np.int8)
    out = np.empty_like(codes)
    N, L = codes.shape if codes.ndim == 2 else (0, 0)
    lib.bamm_revcomp_batch(
        _ptr(codes, ctypes.c_int8), _ptr(lens32, ctypes.c_int32),
        np.int64(N), np.int64(L), _ptr(comp, ctypes.c_int8),
        np.int64(comp.size), np.int8(AMBIG), np.int8(PAD),
        _ptr(out, ctypes.c_int8),
    )
    return out
