"""One-shot self-build of the native runtime library (native/build.sh).

The .so is not committed (fresh checkouts start without it), but the native
components it provides — per-KF IMU preintegration, the m12 feed packer,
the decode-ahead frame loader — are the production host paths; silently
falling back to their Python equivalents costs real per-frame budget. Each
ctypes loader calls `ensure_native_lib` before giving up.
"""
from __future__ import annotations

import os
import subprocess

_attempted = False


def ensure_native_lib(lib_path: str) -> bool:
    """Build native/libgfs_native.so via build.sh if missing (once per
    process). Returns True when the library exists afterwards."""
    global _attempted
    if os.path.exists(lib_path):
        return True
    if _attempted:
        return False
    _attempted = True
    build = os.path.join(os.path.dirname(lib_path), "build.sh")
    if not os.path.exists(build):
        return False
    try:
        subprocess.run(["bash", build], capture_output=True, timeout=120,
                       check=True)
    except Exception:
        return False
    return os.path.exists(lib_path)
