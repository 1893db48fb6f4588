"""Native (C++) runtime components, loaded through ctypes.

Build happens on demand with the system g++ (pybind11 is not available in
this image); the compiled library is cached next to the sources. Every entry
point has a pure-numpy fallback, so the package works without a compiler.
"""

import ctypes
import subprocess

from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "chainstore.cpp"
_LIB = _HERE / "build" / "libchainstore.so"

_lib = None
_build_failed = False


def _build():
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
         str(_SRC), "-o", str(_LIB)],
        check=True, capture_output=True,
    )


def get_chainstore():
    """Return the loaded chainstore library, building it if needed; None if
    no toolchain is available."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.write_csv_f64.restype = ctypes.c_int
        lib.write_csv_f64.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p]
        lib.write_csv_i64.restype = ctypes.c_int
        lib.write_csv_i64.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p]
        lib.read_csv_f64.restype = ctypes.c_int64
        lib.read_csv_f64.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def write_csv(path, array, mode="a"):
    """Write a 2-D array as CSV (%.18e floats / %d ints). Returns True if the
    native path was used, False if the caller should fall back to numpy."""
    import numpy as np

    lib = get_chainstore()
    if lib is None:
        return False
    a = np.ascontiguousarray(array)
    if a.ndim == 1:
        a = a[:, None]
    if a.dtype.kind in "iub":
        a = a.astype(np.int64)
        ptr = a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        rc = lib.write_csv_i64(str(path).encode(), ptr, a.shape[0], a.shape[1],
                               mode.encode())
    else:
        a = a.astype(np.float64)
        ptr = a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        rc = lib.write_csv_f64(str(path).encode(), ptr, a.shape[0], a.shape[1],
                               mode.encode())
    if rc != 0:
        raise OSError(f"chainstore write failed with code {rc} for {path}")
    return True


def read_csv(path):
    """Parse a chainstore CSV back into a float64 [rows, cols] array through
    the native strtod loop (numpy.loadtxt is ~10x slower on %.18e cells).
    Returns None if the caller should fall back to numpy."""
    import numpy as np

    lib = get_chainstore()
    if lib is None:
        return None
    path = Path(path)
    size = path.stat().st_size
    if size == 0:
        return np.zeros((0, 0), dtype=np.float64)
    with open(path, "r") as f:
        first = f.readline()
    cols = first.count(",") + 1
    # every cell is at least one char plus a separator/newline
    max_rows = size // (2 * cols) + 2
    out = np.empty((max_rows, cols), dtype=np.float64)
    rows = lib.read_csv_f64(str(path).encode(),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                            max_rows, cols)
    if rows < 0:
        return None
    return out[:rows].copy()
