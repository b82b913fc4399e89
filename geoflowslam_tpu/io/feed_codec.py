"""Packed single-buffer frame feed (wire codec for the host->device link).

The RGB-D frame feed is the biggest line item of the per-frame budget on a
bandwidth-constrained accelerator link (tunneled TPU here; GigE/USB camera
links in deployment face the same wall). This codec packs one frame into a
single 1-D uint8 buffer:

    [ gray u8 (H*W) | depth 12-bit packed, 2 px -> 3 bytes (H*W/2*3) ]

Depth is quantized to 12 bits at 4 mm per step (16.4 m range) — the
GigE-Vision "Mono12p" wire format; +-2 mm quantization error is an order of
magnitude below RGB-D sensor noise (D435i: ~2% of range). 0.75 MB/frame at
640x480 vs 2.4 MB for pre-converted float32 — measured 15 ms/frame vs
69 ms/frame on the tunnel.

The device side unpacks inside the jitted frame build
(state/frame.build_frame), so XLA fuses the unpack into the first image op.
The reference feeds cv::Mat 8UC1 + 16UC1 (/root/reference/src/Frame.cc:304,
RGBD.DepthMapFactor); this is the same sensor data, packed for the wire.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

M12_STEP_M = 0.004        # metres per 12-bit depth step (4 mm)
M12_MAX_Q = 4095

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libgfs_native.so")
_lib = None


def _load_lib():
    """Native single-pass packer (native/feed_pack.cpp): ~0.2 ms at
    640x480 vs ~3 ms through numpy temporaries — per-frame host work on
    the production feed path."""
    global _lib
    if _lib is not None:
        return _lib if _lib != 0 else None
    from geoflowslam_tpu.utils.native_build import ensure_native_lib
    if not ensure_native_lib(_LIB_PATH):
        _lib = 0
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.gfs_pack_m12.restype = ctypes.c_long
        lib.gfs_pack_m12.argtypes = [
            u8p, np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, u8p]
        lib.gfs_pack_m12f.restype = ctypes.c_long
        lib.gfs_pack_m12f.argtypes = [
            u8p, np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, u8p]
    except (OSError, AttributeError):
        _lib = 0
        return None
    _lib = lib
    return lib


def packed_size(h: int, w: int) -> int:
    assert w % 2 == 0
    return h * w + (h * w // 2) * 3


def pack_m12(gray: np.ndarray, depth: np.ndarray,
             depth_unit_m: float) -> np.ndarray:
    """Pack (gray [H,W] uint8-able, depth [H,W] in `depth_unit_m` units)
    into the 1-D uint8 wire buffer. Invalid/out-of-range depth packs to 0
    (= invalid downstream, matching the <=0 depth convention)."""
    h, w = gray.shape
    g = gray if gray.dtype == np.uint8 else \
        np.clip(gray, 0, 255).astype(np.uint8)
    scale = depth_unit_m / M12_STEP_M
    lib = _load_lib()
    if lib is not None:
        out = np.empty(packed_size(h, w), np.uint8)
        g = np.ascontiguousarray(g)
        if depth.dtype == np.uint16:
            lib.gfs_pack_m12(g, np.ascontiguousarray(depth), h, w,
                             np.float32(scale), out)
        else:
            lib.gfs_pack_m12f(
                g, np.ascontiguousarray(depth, np.float32), h, w,
                np.float32(scale), out)
        return out
    # round-half-up to match the native packer exactly (np.rint would
    # round half-to-even)
    q = np.floor(np.clip(depth.astype(np.float32) * scale, 0, M12_MAX_Q)
                 + 0.5).astype(np.uint16)
    a, b = q[:, 0::2], q[:, 1::2]
    out = np.empty((h, w // 2, 3), np.uint8)
    out[..., 0] = a & 0xFF
    out[..., 1] = ((a >> 8) | ((b & 0xF) << 4)).astype(np.uint8)
    out[..., 2] = (b >> 4).astype(np.uint8)
    return np.concatenate([g.reshape(-1), out.reshape(-1)])


def unpack_m12_np(buf: np.ndarray, h: int, w: int):
    """Host-side reference unpack (tests / debugging): returns
    (gray u8 [H,W], depth_q u16 [H,W] in 4 mm steps)."""
    g = buf[:h * w].reshape(h, w)
    p = buf[h * w:].reshape(h, w // 2, 3).astype(np.uint16)
    a = p[..., 0] | ((p[..., 1] & 0xF) << 8)
    b = (p[..., 1] >> 4) | (p[..., 2] << 4)
    q = np.stack([a, b], -1).reshape(h, w)
    return g, q
