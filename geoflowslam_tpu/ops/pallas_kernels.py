"""Pallas TPU kernels for the hot front-end ops.

Two kernels, both written against the TPU memory model (HBM -> VMEM tiles,
MXU for contractions, VPU for stencils) per the Pallas guide:

* `fast_scores_pallas` — the FAST-9 corner response for two thresholds in
  one pass: a row-tiled stencil over a VMEM-resident image that keeps the 16
  ring-shifted views in registers (never materializing the [16, H, W] diff
  stack in HBM that the XLA version streams), with the int32 bit-trick arc
  test fused in.
* `hamming_argmin2_pallas` — streaming best/second-best Hamming search:
  query {-1,+1} bf16 codes tile through the MXU against target tiles,
  tracking (best, second, argbest) in VMEM — the [N, M] distance matrix
  never exists in HBM and the separate top_k pass disappears.

Both have shape guards; callers fall back to the XLA implementations on CPU
(tests run on the host platform) or odd shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 3  # FAST ring radius
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _arc_ok(bits):
    m = bits | (bits << 16)
    t = m & (m >> 1)
    t = t & (t >> 2)
    t = t & (t >> 4)
    t = t & (m >> 8)
    return (t & jnp.int32(0xFFFF)) != 0


def _fast_kernel(img_ref, out_lo_ref, out_hi_ref, *, th_lo, th_hi, tile_h, w):
    """One grid step computes rows [i*tile_h, (i+1)*tile_h) of the outputs;
    the whole padded image sits in VMEM (640x480 f32 = 1.2 MB << 16 MB)."""
    i = pl.program_id(0)
    row0 = i * tile_h                       # top of this tile in the PADDED img
    blk = img_ref[pl.ds(row0, tile_h + 2 * _R), :]
    center = blk[_R:_R + tile_h, :]

    bright_lo = jnp.zeros((tile_h, w), jnp.int32)
    dark_lo = jnp.zeros((tile_h, w), jnp.int32)
    bright_hi = jnp.zeros((tile_h, w), jnp.int32)
    dark_hi = jnp.zeros((tile_h, w), jnp.int32)
    sb_lo = jnp.zeros((tile_h, w), jnp.float32)
    sd_lo = jnp.zeros((tile_h, w), jnp.float32)
    sb_hi = jnp.zeros((tile_h, w), jnp.float32)
    sd_hi = jnp.zeros((tile_h, w), jnp.float32)

    for k, (dy, dx) in enumerate(_CIRCLE):
        rows = blk[_R + dy: _R + dy + tile_h, :]
        # pltpu.roll requires non-negative shift; (-dx) % w == left-shift by dx
        shifted = pltpu.roll(rows, (-dx) % w, 1) if dx != 0 else rows
        d = shifted - center
        bright_lo |= (d > th_lo).astype(jnp.int32) << k
        dark_lo |= (d < -th_lo).astype(jnp.int32) << k
        bright_hi |= (d > th_hi).astype(jnp.int32) << k
        dark_hi |= (d < -th_hi).astype(jnp.int32) << k
        sb_lo += jnp.maximum(d - th_lo, 0.0)
        sd_lo += jnp.maximum(-d - th_lo, 0.0)
        sb_hi += jnp.maximum(d - th_hi, 0.0)
        sd_hi += jnp.maximum(-d - th_hi, 0.0)

    out_lo_ref[:] = (jnp.where(_arc_ok(bright_lo), sb_lo, 0.0)
                     + jnp.where(_arc_ok(dark_lo), sd_lo, 0.0))
    out_hi_ref[:] = (jnp.where(_arc_ok(bright_hi), sb_hi, 0.0)
                     + jnp.where(_arc_ok(dark_hi), sd_hi, 0.0))


def fast_supported(h: int, w: int) -> bool:
    return w % 128 == 0


def fast_scores_pallas(img: jnp.ndarray, th_lo: float, th_hi: float,
                       tile_h: int = 64):
    """[H, W] -> (score_lo, score_hi) FAST-9 responses at two thresholds.

    W must be a multiple of 128 (lane width). The horizontal `roll` wraps at
    row ends; the border mask below kills those pixels exactly like the XLA
    version's `inside` mask.
    """
    h, w = img.shape
    ph = ((h + tile_h - 1) // tile_h) * tile_h
    imgp = jnp.pad(img, ((_R, ph - h + _R), (0, 0)), mode="edge")

    grid = (ph // tile_h,)
    kern = functools.partial(_fast_kernel, th_lo=float(th_lo),
                             th_hi=float(th_hi), tile_h=tile_h, w=w)
    score_lo, score_hi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],   # whole image
        out_specs=[
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((ph, w), jnp.float32)] * 2,
    )(imgp)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= _R) & (ys < h - _R) & (xs >= _R) & (xs < w - _R)
    return (jnp.where(inside, score_lo[:h], 0.0),
            jnp.where(inside, score_hi[:h], 0.0))


# ---------------------------------------------------------------------------
# Streaming Hamming best/second-best search
# ---------------------------------------------------------------------------

def _hamming_kernel(q_ref, t_ref, best_ref, second_ref, idx_ref, *,
                    tile_n, tile_m):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full((tile_n, 128), 1e9, jnp.float32)
        second_ref[:] = jnp.full((tile_n, 128), 1e9, jnp.float32)
        idx_ref[:] = jnp.full((tile_n, 128), -1, jnp.int32)

    q = q_ref[:]                             # [tile_n, 256] bf16 (+-1)
    t = t_ref[:]                             # [256, tile_m] bf16 (pre-transposed)
    # this Mosaic version rejects bf16 lhs for tpu.matmul; f32 is fine (the
    # MXU still runs it, values are small integers so precision is exact)
    dot = jax.lax.dot_general(q.astype(jnp.float32), t.astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dist = (256.0 - dot) * 0.5               # [tile_n, tile_m]

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_m), 1)
    d1 = jnp.min(dist, axis=1, keepdims=True)            # [tile_n, 1]
    a1 = jnp.argmin(dist, axis=1).astype(jnp.int32)      # [tile_n]
    masked = jnp.where(col == a1[:, None], 1e9, dist)
    d2 = jnp.min(masked, axis=1, keepdims=True)

    d1b = jnp.broadcast_to(d1, (tile_n, 128))
    d2b = jnp.broadcast_to(d2, (tile_n, 128))
    a1b = jnp.broadcast_to((a1 + j * tile_m)[:, None], (tile_n, 128))

    cur_best = best_ref[:]
    cur_second = second_ref[:]
    cur_idx = idx_ref[:]

    take_new = d1b < cur_best
    best_ref[:] = jnp.minimum(cur_best, d1b)
    second_ref[:] = jnp.where(take_new, jnp.minimum(cur_best, d2b),
                              jnp.minimum(cur_second, d1b))
    idx_ref[:] = jnp.where(take_new, a1b, cur_idx)


def hamming_supported(n: int, m: int, tile_n: int = 256, tile_m: int = 512) -> bool:
    return n % tile_n == 0 and m % tile_m == 0


def hamming_argmin2_pallas(q_pm1: jnp.ndarray, t_pm1: jnp.ndarray,
                           tile_n: int = 256, tile_m: int = 512):
    """Best/second-best Hamming via streaming MXU tiles.

    q_pm1 [N, 256], t_pm1 [M, 256] in {-1, +1} bf16 (ops/orb.unpack_bits_pm1).
    Returns (best [N] f32, second [N] f32, argbest [N] i32). N % tile_n == 0,
    M % tile_m == 0 (caller pads; padded target rows must be made +inf by the
    caller masking their codes to match nothing, or filtered afterwards).
    """
    n, _ = q_pm1.shape
    m, _ = t_pm1.shape
    t_t = t_pm1.T  # [256, M]: Mosaic matmul wants the rhs in [K, N] layout
    grid = (n // tile_n, m // tile_m)
    kern = functools.partial(_hamming_kernel, tile_n=tile_n, tile_m=tile_m)
    best, second, idx = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.int32),
        ],
    )(q_pm1, t_t)
    return best[:, 0], second[:, 0], idx[:, 0]


def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
