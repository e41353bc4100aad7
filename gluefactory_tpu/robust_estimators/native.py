"""ctypes binding + on-demand build of the in-repo C++ LO-RANSAC library
(`native/fastransac.cpp`). No pybind11 in this image — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .. import logger

NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libfastransac.so"
_lib = None


def build_library() -> Path:
    src = NATIVE_DIR / "fastransac.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(LIB_PATH),
    ]
    logger.info("Building native fastransac: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB_PATH


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not LIB_PATH.exists() or LIB_PATH.stat().st_mtime < (NATIVE_DIR / "fastransac.cpp").stat().st_mtime:
        build_library()
    lib = ctypes.CDLL(str(LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ransac_homography_cpp.restype = ctypes.c_int64
    lib.ransac_homography_cpp.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.c_uint64, dp, u8p,
    ]
    lib.ransac_essential_cpp.restype = ctypes.c_int64
    lib.ransac_essential_cpp.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.c_uint64, dp, dp, u8p,
    ]
    _lib = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ransac_homography_native(pts0, pts1, th: float, max_iters: int = 2000, seed: int = 0):
    lib = get_lib()
    p0 = np.ascontiguousarray(pts0, np.float64)
    p1 = np.ascontiguousarray(pts1, np.float64)
    n = len(p0)
    H = np.zeros(9, np.float64)
    inliers = np.zeros(n, np.uint8)
    num = lib.ransac_homography_cpp(
        _dp(p0), _dp(p1), n, float(th), int(max_iters), int(seed),
        _dp(H), inliers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return H.reshape(3, 3), inliers.astype(bool), int(num)


def ransac_essential_native(p0n, p1n, th: float, max_iters: int = 2000, seed: int = 0):
    lib = get_lib()
    p0 = np.ascontiguousarray(p0n, np.float64)
    p1 = np.ascontiguousarray(p1n, np.float64)
    n = len(p0)
    R = np.zeros(9, np.float64)
    t = np.zeros(3, np.float64)
    inliers = np.zeros(n, np.uint8)
    num = lib.ransac_essential_cpp(
        _dp(p0), _dp(p1), n, float(th), int(max_iters), int(seed),
        _dp(R), _dp(t),
        inliers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return R.reshape(3, 3), t, inliers.astype(bool), int(num)
