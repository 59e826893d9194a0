"""ctypes bindings for the native C++ host runtime (see ckks_native.cpp).

Compiled lazily with g++ into the package directory and cached by source
hash; every entry point has a pure-Python fallback in math/, so the
library degrades gracefully if no compiler is present
(``available()`` -> False).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ckks_native.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, f"_ckks_native_{digest}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("CKKS_DISABLE_NATIVE"):
            return None
        path = _compile()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u64 = ctypes.c_uint64
        i64 = ctypes.c_int64
        p_u64 = ctypes.POINTER(u64)
        p_i64 = ctypes.POINTER(i64)
        p_f64 = ctypes.POINTER(ctypes.c_double)
        lib.ckks_is_prime_u64.restype = ctypes.c_int
        lib.ckks_is_prime_u64.argtypes = [u64]
        lib.ckks_first_prime_up.restype = u64
        lib.ckks_first_prime_up.argtypes = [u64, u64]
        lib.ckks_first_prime_down.restype = u64
        lib.ckks_first_prime_down.argtypes = [u64, u64]
        lib.ckks_reduce_coeffs.restype = None
        lib.ckks_reduce_coeffs.argtypes = [p_i64, i64, p_u64, i64, p_u64]
        lib.ckks_crt_reconstruct.restype = ctypes.c_int
        lib.ckks_crt_reconstruct.argtypes = [p_u64, i64, p_u64, i64, i64, p_u64]
        lib.ckks_crt_to_double.restype = ctypes.c_int
        lib.ckks_crt_to_double.argtypes = [
            p_u64, i64, p_u64, i64, i64, ctypes.c_double, p_f64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def is_prime_u64(n: int) -> bool:
    return bool(_load().ckks_is_prime_u64(n))


def first_prime_up(start: int, two_n: int) -> int:
    """Smallest prime p == 1 (mod two_n), p found by stepping up from
    ``start`` (exclusive unless start == 1 mod two_n handled by caller).
    Returns 0 on u64 overflow."""
    return int(_load().ckks_first_prime_up(start, two_n))


def first_prime_down(bound: int, two_n: int) -> int:
    """Largest prime p < bound with p == 1 (mod two_n); 0 if none."""
    return int(_load().ckks_first_prime_down(bound, two_n))


def reduce_coeffs(coeffs, moduli):
    """int64 coefficient array -> (L, N) uint64 non-negative residues."""
    import numpy as np

    lib = _load()
    c = np.ascontiguousarray(coeffs, dtype=np.int64)
    m = np.ascontiguousarray(moduli, dtype=np.uint64)
    out = np.empty((len(m), c.shape[-1]), dtype=np.uint64)
    lib.ckks_reduce_coeffs(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        c.shape[-1],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(m),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out


def _words_for(moduli) -> int:
    bits = sum(int(m).bit_length() for m in moduli) + 2 + len(moduli).bit_length()
    return (bits + 63) // 64 + 1


def crt_reconstruct_centered(residues, moduli):
    """(L, N) uint64 residues -> N exact centered Python ints."""
    import numpy as np

    lib = _load()
    r = np.ascontiguousarray(residues, dtype=np.uint64)
    m = np.ascontiguousarray(moduli, dtype=np.uint64)
    L, n = r.shape
    W = _words_for(moduli)
    out = np.empty((n, W), dtype=np.uint64)
    rc = lib.ckks_crt_reconstruct(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        L,
        W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError("ckks_crt_reconstruct failed")
    raw = out.tobytes()  # row-major: n coefficients x W little-endian words
    stride = W * 8
    return np.array(
        [
            int.from_bytes(raw[j * stride : (j + 1) * stride], "little",
                           signed=True)
            for j in range(n)
        ],
        dtype=object,
    )


def crt_to_double(residues, moduli, scale: float):
    """(L, N) uint64 residues -> N float64 centered values / scale."""
    import numpy as np

    lib = _load()
    r = np.ascontiguousarray(residues, dtype=np.uint64)
    m = np.ascontiguousarray(moduli, dtype=np.uint64)
    L, n = r.shape
    W = _words_for(moduli)
    out = np.empty(n, dtype=np.float64)
    rc = lib.ckks_crt_to_double(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        L,
        W,
        ctypes.c_double(scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError("ckks_crt_to_double failed")
    return out
