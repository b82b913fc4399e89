"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by the
dual-stream optical-flow tracker (ORBmatcher::SearchByProjectionWithOF
3-level prior stream + 6-level 2D stream, /root/reference/src/ORBmatcher.cc:
2303-2497; fbKltTracking forward/backward check :2186; Tracking::fbKltTracking
src/Tracking.cc:3262; pyramid built per frame in Frame ctor src/Frame.cc:373).

Shape-static design: every keypoint runs the same fixed iteration count per
level with masked convergence (`lax.while` would desync the batch); patch
gathers are bilinear interpolation via 4 fused gathers over the level image.
vmap over N keypoints; levels unrolled coarse->fine (static list).
"""
from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample img at float coords (x [..., ], y [...]) with border clamp."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = x - x0
    dy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy)
            + v10 * (1 - dx) * dy + v11 * dx * dy)


class KLTResult(NamedTuple):
    pts: jnp.ndarray     # [N,2] tracked positions (level-0 coords)
    status: jnp.ndarray  # [N] bool
    err: jnp.ndarray     # [N] mean abs residual over the window


def _track_level(img_prev, img_next, pts_prev_lvl, guess_lvl, win: int,
                 iters: int, min_eig: float):
    """One pyramid level of LK for all points. Returns (new guess, ok)."""
    r = win // 2
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32), indexing="xy"), axis=-1).reshape(-1, 2)
    h, w = img_prev.shape

    def one(p_prev, g):
        px = p_prev[0] + offs[:, 0]
        py = p_prev[1] + offs[:, 1]
        tmpl = _bilinear(img_prev, px, py)
        ix = 0.5 * (_bilinear(img_prev, px + 1, py) - _bilinear(img_prev, px - 1, py))
        iy = 0.5 * (_bilinear(img_prev, px, py + 1) - _bilinear(img_prev, px, py - 1))
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good_grad = eig_min / (win * win) > min_eig
        inv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)

        def body(_, g):
            qx = g[0] + offs[:, 0]
            qy = g[1] + offs[:, 1]
            cur = _bilinear(img_next, qx, qy)
            di = cur - tmpl
            b = jnp.array([jnp.sum(di * ix), jnp.sum(di * iy)])
            step = -inv @ b
            return g + jnp.where(good_grad, step, 0.0)

        g_out = jax.lax.fori_loop(0, iters, body, g)
        qx = g_out[0] + offs[:, 0]
        qy = g_out[1] + offs[:, 1]
        err = jnp.mean(jnp.abs(_bilinear(img_next, qx, qy) - tmpl))
        # point (not whole patch) must stay inside: the bilinear sampler
        # border-clamps, which matches cv::buildOpticalFlowPyramid's
        # replicated-border padding semantics.
        inb = (g_out[0] >= 0) & (g_out[0] <= w - 1) & (g_out[1] >= 0) & (g_out[1] <= h - 1)
        return g_out, good_grad & inb, err

    return jax.vmap(one)(pts_prev_lvl, guess_lvl)


def klt_track(pyr_prev: List[jnp.ndarray], pyr_next: List[jnp.ndarray],
              pts_prev: jnp.ndarray, init_guess: jnp.ndarray | None = None,
              scale_factor: float = 2.0, win: int = 21, iters: int = 10,
              min_eig: float = 1e-4, max_levels: int | None = None) -> KLTResult:
    """Track pts_prev (level-0 coords) from pyr_prev to pyr_next.

    `init_guess` (level-0 coords) seeds the search — used by the 3D-prior
    stream which initializes at map-point projections (ORBmatcher.cc:2379).
    """
    n_levels = len(pyr_prev) if max_levels is None else min(max_levels, len(pyr_prev))
    if init_guess is None:
        init_guess = pts_prev

    top = n_levels - 1
    inv_top = 1.0 / (scale_factor ** top)
    g = init_guess * inv_top
    ok_all = jnp.ones(pts_prev.shape[0], bool)
    err = jnp.zeros(pts_prev.shape[0])
    for lvl in range(top, -1, -1):
        s = 1.0 / (scale_factor ** lvl)
        p_lvl = pts_prev * s
        g, ok, err = _track_level(pyr_prev[lvl], pyr_next[lvl], p_lvl, g, win, iters, min_eig)
        ok_all = ok_all & ok
        if lvl > 0:
            g = g * scale_factor
    return KLTResult(pts=g, status=ok_all, err=err)


def fb_klt_track(pyr_prev, pyr_next, pts_prev, init_guess=None,
                 fb_thresh: float = 1.0, **kw) -> KLTResult:
    """Forward-backward LK with consistency gating (Tracking::fbKltTracking,
    /root/reference/src/Tracking.cc:3262 and ORBmatcher.cc:2186)."""
    fwd = klt_track(pyr_prev, pyr_next, pts_prev, init_guess, **kw)
    bwd = klt_track(pyr_next, pyr_prev, fwd.pts, fwd.pts, **kw)
    fb_err = jnp.linalg.norm(bwd.pts - pts_prev, axis=1)
    status = fwd.status & bwd.status & (fb_err < fb_thresh)
    return KLTResult(pts=fwd.pts, status=status, err=fwd.err)


def build_lk_pyramid(img: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """Half-resolution pyramid with 5x5 Gaussian smoothing per octave
    (cv::buildOpticalFlowPyramid analogue; Frame.cc:373 builds maxLevel=6)."""
    from geoflowslam_tpu.ops.pyramid import gaussian_blur

    levels = [img]
    for _ in range(1, n_levels):
        sm = gaussian_blur(levels[-1], 5, 1.1)
        levels.append(sm[::2, ::2])
    return levels
