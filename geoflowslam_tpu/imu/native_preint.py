"""ctypes wrapper for the native IMU preintegrator (native/imu_preint.cpp).

The per-KF segment preintegration is HOST work (raw host samples in, host
numpy out for build_segments / the IMU initializer); running it through jax
cost either a ~60 ms CPU-scan dispatch or a TPU round trip serialized behind
the frame queue. The C++ loop does a 512-sample segment in ~10 us.

Parity with imu.preintegration.preintegrate is tested to 1e-4
(tests/test_native_preint.py). Falls back to None when the shared library
hasn't been built (native/build.sh)."""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libgfs_native.so")
_lib = None
_checked = False

OUT_SIZE = 1 + 9 + 3 + 3 + 5 * 9 + 225  # 286


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    from geoflowslam_tpu.utils.native_build import ensure_native_lib
    if not ensure_native_lib(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        fn = lib.gfs_preintegrate
    except (OSError, AttributeError):
        return None
    fn.restype = None
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preintegrate_np(acc: np.ndarray, gyro: np.ndarray, dts: np.ndarray,
                    bias: np.ndarray, cov_noise: np.ndarray,
                    cov_walk: np.ndarray):
    """Returns an imu.preintegration.Preintegrated of HOST numpy arrays, or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from geoflowslam_tpu.imu.preintegration import Preintegrated

    acc = np.ascontiguousarray(acc, np.float32)
    gyro = np.ascontiguousarray(gyro, np.float32)
    dts = np.ascontiguousarray(dts, np.float32)
    bias = np.ascontiguousarray(bias, np.float32)
    cov_noise = np.ascontiguousarray(cov_noise, np.float32)
    cov_walk = np.ascontiguousarray(cov_walk, np.float32)
    out = np.zeros((OUT_SIZE,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gfs_preintegrate(
        acc.ctypes.data_as(fp), gyro.ctypes.data_as(fp),
        dts.ctypes.data_as(fp), ctypes.c_int(len(dts)),
        bias.ctypes.data_as(fp), cov_noise.ctypes.data_as(fp),
        cov_walk.ctypes.data_as(fp), out.ctypes.data_as(fp))
    o = out
    i = 0

    def take(n, shape=None):
        nonlocal i
        v = o[i:i + n]
        i += n
        return v.reshape(shape) if shape else v

    dt = float(take(1)[0])
    dR = take(9, (3, 3))
    dV = take(3)
    dP = take(3)
    JRg = take(9, (3, 3))
    JVg = take(9, (3, 3))
    JVa = take(9, (3, 3))
    JPg = take(9, (3, 3))
    JPa = take(9, (3, 3))
    cov = take(225, (15, 15))
    return Preintegrated(
        dt=np.float32(dt), dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa,
        JPg=JPg, JPa=JPa, cov=cov, bias=bias,
        meas_acc=acc, meas_gyro=gyro, meas_dt=dts)
