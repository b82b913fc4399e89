"""Rectified stereo matching: per-keypoint SAD search along the epipolar row.

TPU-native replacement for Frame::ComputeStereoMatches
(/root/reference/src/Frame.cc:1153-1313): the reference does a row-bucketed
descriptor match followed by an 11x11 SAD refinement with subpixel parabola
fitting; here the SAD search runs densely over the full disparity range for
every keypoint in one vmapped pass (the [N, D] cost tile is tiny for the
MXU), with the same best/second gating and parabolic subpixel refinement.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _patch(img, cx, cy, half: int):
    """[2h+1, 2h+1] patch around (cx, cy) with border clamp (int coords)."""
    h, w = img.shape
    ys = jnp.clip(cy + jnp.arange(-half, half + 1), 0, h - 1)
    xs = jnp.clip(cx + jnp.arange(-half, half + 1), 0, w - 1)
    return img[ys[:, None], xs[None, :]]


@partial(jax.jit, static_argnames=("max_disp", "half"))
def stereo_match(img_l: jnp.ndarray, img_r: jnp.ndarray, uv: jnp.ndarray,
                 valid: jnp.ndarray, bf: float, min_disp: float = 0.5,
                 max_disp: int = 64, half: int = 5, sad_ratio: float = 0.9):
    """Match left keypoints into the right image.

    Returns (u_right [N], depth [N]) with -1 where matching failed.
    """
    n = uv.shape[0]
    ui = jnp.round(uv[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)

    def one(u, v, ok):
        pl = _patch(img_l, u, v, half)
        pl = pl - pl[half, half]

        def cost_at(d):
            pr = _patch(img_r, u - d, v, half)
            pr = pr - pr[half, half]
            return jnp.sum(jnp.abs(pl - pr))

        costs = jax.vmap(cost_at)(jnp.arange(max_disp))
        best = jnp.argmin(costs)
        c_best = costs[best]
        second = jnp.min(jnp.where(jnp.arange(max_disp) == best, jnp.inf, costs))
        # subpixel parabola
        cm1 = costs[jnp.clip(best - 1, 0, max_disp - 1)]
        cp1 = costs[jnp.clip(best + 1, 0, max_disp - 1)]
        denom = cm1 + cp1 - 2 * c_best
        delta = jnp.where(jnp.abs(denom) > 1e-6,
                          0.5 * (cm1 - cp1) / jnp.maximum(denom, 1e-6), 0.0)
        delta = jnp.clip(delta, -1.0, 1.0)
        disp = best.astype(jnp.float32) + delta
        good = ok & (disp >= min_disp) & (best > 0) & (best < max_disp - 1) \
            & (c_best < sad_ratio * second + 1e-6) \
            & (u - max_disp >= 0)
        ur = jnp.where(good, u.astype(jnp.float32) - disp, -1.0)
        depth = jnp.where(good, bf / jnp.maximum(disp, min_disp), -1.0)
        return ur, depth

    return jax.vmap(one)(ui, vi, valid)
