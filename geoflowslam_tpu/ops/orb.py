"""ORB orientation + rotated BRIEF-256 descriptors, batched.

TPU-native replacement for ORBextractor::computeOrientation (intensity
centroid over a 31x31 circular patch) and computeOrbDescriptor (steered
BRIEF-256 on the Gaussian-blurred image)
(/root/reference/src/ORBextractor.cc:99-480).

Two deliberate departures from the reference, both documented:

* Orientation moments are computed as two dense depthwise convolutions over
  the whole level (x- and y-weighted circular masks) followed by a single
  gather per keypoint, instead of per-keypoint patch loops — identical values,
  one fused conv instead of N scattered reads.
* The BRIEF sampling pattern is a deterministically generated Gaussian pair
  pattern (seeded, sigma = patch/5 as in the BRIEF paper) rather than the
  learned table hard-coded in OpenCV/ORB-SLAM. Descriptors are therefore not
  bit-compatible with the C++ build (matching behaviour and invariances are
  equivalent); vocabularies are trained for this pattern (retrieval/vocab.py).

Descriptors are returned as [N, 8] uint32 (256 bits).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PATCH_SIZE = 31
HALF_PATCH = 15
N_BITS = 256


def _circular_masks():
    """x/y-weighted circular masks for the intensity centroid, exactly the
    u_max circle used by the reference (ORBextractor ctor, src/ORBextractor.cc)."""
    vs, us = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    # reference umax: for v in [0, r], umax[v] = round(sqrt(r^2 - v^2)) with
    # symmetry fix-ups; the plain disc |(u,v)| <= r + 0.5 reproduces it.
    disc = (us * us + vs * vs) <= (HALF_PATCH * HALF_PATCH + HALF_PATCH * 0.5)
    mx = (us * disc).astype(np.float32)
    my = (vs * disc).astype(np.float32)
    # numpy (not jnp): module-level cache must hold constants, never tracers
    return mx, my


_MX, _MY = None, None


def _get_masks():
    global _MX, _MY
    if _MX is None:
        _MX, _MY = _circular_masks()
    return _MX, _MY


def orientation_maps(img: jnp.ndarray):
    """Dense m10/m01 moment maps via conv; angle = atan2(m01, m10) at kp."""
    mx, my = _get_masks()
    pad = HALF_PATCH
    x = jnp.pad(img, pad, mode="edge")[None, None]

    def conv(kernel):
        return jax.lax.conv_general_dilated(
            x, kernel[None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    return conv(mx), conv(my)


def compute_orientations(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Angles (radians) for keypoints xy [N, 2] (x, y) on level image."""
    m10, m01 = orientation_maps(img)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, img.shape[1] - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, img.shape[0] - 1)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


def _brief_pattern(seed: int = 12345) -> np.ndarray:
    """Deterministic Gaussian BRIEF pattern: [256, 4] int32 (x1,y1,x2,y2),
    points ~ N(0, (patch/5)^2) clipped to the patch (BRIEF paper G-II)."""
    rng = np.random.RandomState(seed)
    sigma = PATCH_SIZE / 5.0
    pts = rng.randn(N_BITS, 4) * sigma
    pts = np.clip(np.round(pts), -(HALF_PATCH - 2), HALF_PATCH - 2)
    # Avoid degenerate identical pairs.
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] += 1
    return pts.astype(np.int32)


_PATTERN = None


def get_pattern() -> np.ndarray:
    global _PATTERN
    if _PATTERN is None:
        _PATTERN = _brief_pattern()  # numpy constant (jit-safe cache)
    return _PATTERN


def compute_descriptors(img_blur: jnp.ndarray, xy: jnp.ndarray,
                        angles: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF-256 for N keypoints -> [N, 8] uint32.

    img_blur: the Gaussian-blurred level image; xy: [N,2] (x,y); angles: [N].
    Pattern points are rotated by the keypoint angle and rounded, exactly the
    GET_VALUE scheme in computeOrbDescriptor (ORBextractor.cc:99-156).
    """
    h, w = img_blur.shape
    pat = get_pattern().astype(jnp.float32)          # [256, 4]
    ca, sa = jnp.cos(angles), jnp.sin(angles)        # [N]

    p1 = pat[:, 0:2]   # [256, 2] (x, y)
    p2 = pat[:, 2:4]

    def rotate(p):  # [256,2] x [N] -> [N,256,2]
        rx = p[None, :, 0] * ca[:, None] - p[None, :, 1] * sa[:, None]
        ry = p[None, :, 0] * sa[:, None] + p[None, :, 1] * ca[:, None]
        return jnp.stack([rx, ry], axis=-1)

    r1 = rotate(p1) + xy[:, None, :]
    r2 = rotate(p2) + xy[:, None, :]

    def sample(pts):  # [N,256,2] -> [N,256] nearest-neighbour intensities
        xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, h - 1)
        return img_blur[yi, xi]

    bits = (sample(r1) < sample(r2)).astype(jnp.uint32)   # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    return jnp.sum(words, axis=-1).astype(jnp.uint32)      # [N, 8]


def unpack_bits_pm1(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] in {-1, +1} for MXU Hamming matmuls."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256)
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)
