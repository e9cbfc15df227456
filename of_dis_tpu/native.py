"""ctypes bindings to the native C++ runtime library (csrc/ofdis_native.cpp).

The compute path is XLA; the host-side runtime (file codecs, image
conversion) is native C++ like the reference's (run_dense.cpp:16-128).  The
library is built on demand (`make -C csrc`) and loaded lazily; every entry
point has a NumPy fallback in of_dis_tpu.io, selected automatically when the
shared object is unavailable.  Set OF_DIS_NATIVE=0 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_SO = _CSRC / "libofdis_native.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("OF_DIS_NATIVE", "1") == "0":
        return None
    try:
        # Always invoke make (a no-op when up to date): loading a stale .so
        # after editing csrc/ would silently run old code.
        subprocess.run(["make", "-C", str(_CSRC)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
    except Exception:
        return None

    i32, f32p, u8p, cstr = (
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_char_p,
    )
    lib.ofdis_write_flo.argtypes = [cstr, f32p, i32, i32, i32]
    lib.ofdis_flo_dims.argtypes = [cstr, ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.ofdis_read_flo.argtypes = [cstr, f32p, i32, i32, i32]
    lib.ofdis_write_pfm.argtypes = [cstr, f32p, i32, i32, i32]
    lib.ofdis_pfm_dims.argtypes = [
        cstr, ctypes.POINTER(i32), ctypes.POINTER(i32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.ofdis_read_pfm.argtypes = [cstr, f32p, i32, i32, i32]
    lib.ofdis_gray_from_rgb_u8.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.ofdis_pnm_dims.argtypes = [cstr, ctypes.POINTER(i32), ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.ofdis_read_pnm.argtypes = [cstr, u8p, i32, i32, i32]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_flo(path, flow: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    flow = np.ascontiguousarray(flow, dtype=np.float32)
    h, w, nc = flow.shape
    return lib.ofdis_write_flo(str(path).encode(), _fp(flow), w, h, nc) == 0


def read_flo(path) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.ofdis_flo_dims(str(path).encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError(f"bad .flo file {path}")
    out = np.empty((h.value, w.value, 2), np.float32)
    if lib.ofdis_read_flo(str(path).encode(), _fp(out), w, h, 2) != 0:
        raise ValueError(f"truncated .flo file {path}")
    return out


def write_pfm(path, disp: np.ndarray, negate: bool = True) -> bool:
    lib = _load()
    if lib is None:
        return False
    disp = np.ascontiguousarray(disp, dtype=np.float32)
    h, w = disp.shape
    return lib.ofdis_write_pfm(str(path).encode(), _fp(disp), w, h, int(negate)) == 0


def read_pfm(path, negate: bool = False) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    scale = ctypes.c_float()
    if lib.ofdis_pfm_dims(str(path).encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(scale)) != 0:
        raise ValueError(f"bad .pfm file {path}")
    out = np.empty((h.value, w.value), np.float32)
    if lib.ofdis_read_pfm(str(path).encode(), _fp(out), w, h, int(negate)) != 0:
        raise ValueError(f"truncated .pfm file {path}")
    return out


def gray_from_rgb_u8(rgb: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = np.empty(rgb.shape[:2], np.float32)
    lib.ofdis_gray_from_rgb_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fp(out), out.size
    )
    return out


def read_pnm(path) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int32(); h = ctypes.c_int32(); c = ctypes.c_int32()
    if lib.ofdis_pnm_dims(str(path).encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        raise ValueError(f"bad PNM file {path}")
    out = np.empty((h.value, w.value, c.value), np.uint8)
    if lib.ofdis_read_pnm(str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, c) != 0:
        raise ValueError(f"truncated PNM file {path}")
    return out
