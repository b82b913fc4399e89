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
    # whole padded image must fit VMEM comfortably (f32): ~8 MB cap
    pw = ((w + 127) // 128) * 128
    return h >= 2 * _R + 1 and w >= 2 * _R + 1 and h * pw * 4 < 8 * 2 ** 20


def fast_scores_pallas(img: jnp.ndarray, th_lo: float, th_hi: float,
                       tile_h: int = 64):
    """[H, W] -> (score_lo, score_hi) FAST-9 responses at two thresholds.

    Width is padded (edge mode) to the 128-lane multiple internally — pyramid
    levels have arbitrary widths. The horizontal `roll` wraps at padded row
    ends; the border mask below kills those pixels exactly like the XLA
    version's `inside` mask (which also sees edge-replicated padding).
    """
    h, w = img.shape
    pw = ((w + 127) // 128) * 128
    ph = ((h + tile_h - 1) // tile_h) * tile_h
    imgp = jnp.pad(img, ((_R, ph - h + _R), (0, pw - w)), mode="edge")

    grid = (ph // tile_h,)
    kern = functools.partial(_fast_kernel, th_lo=float(th_lo),
                             th_hi=float(th_hi), tile_h=tile_h, w=pw)
    score_lo, score_hi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],   # whole image
        out_specs=[
            pl.BlockSpec((tile_h, pw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, pw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((ph, pw), jnp.float32)] * 2,
    )(imgp)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (ys >= _R) & (ys < h - _R) & (xs >= _R) & (xs < w - _R)
    return (jnp.where(inside, score_lo[:h, :w], 0.0),
            jnp.where(inside, score_hi[:h, :w], 0.0))


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


# ---------------------------------------------------------------------------
# Gated projection search: Hamming + spatial/level/validity gates fused
# ---------------------------------------------------------------------------

def _gated_hamming_kernel(q_ref, t_ref, qm_ref, tm_ref, best_ref, second_ref,
                          idx_ref, *, tile_n, tile_m, min_off, max_off):
    """Streaming best/second Hamming with the projection-search gates fused
    into the tile: the XLA path materializes [N,M] spatial/level masks in HBM
    (ORBmatcher::SearchByProjection's GetFeaturesInArea grid); here the gates
    are VPU ops on the in-VMEM distance tile.

    qm rows (f32, [tile_n, 128]): 0=x, 1=y, 2=radius, 3=level, 4=valid.
    tm ([8, tile_m]): 0=x, 1=y, 2=level, 3=valid.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full((tile_n, 128), 1e9, jnp.float32)
        second_ref[:] = jnp.full((tile_n, 128), 1e9, jnp.float32)
        idx_ref[:] = jnp.full((tile_n, 128), -1, jnp.int32)

    q = q_ref[:]
    t = t_ref[:]
    dot = jax.lax.dot_general(q.astype(jnp.float32), t.astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dist = (256.0 - dot) * 0.5               # [tile_n, tile_m]

    qm = qm_ref[:]                            # [tile_n, 128]
    tm = tm_ref[:]                            # [8, tile_m]
    qx = qm[:, 0:1]; qy = qm[:, 1:2]; qr = qm[:, 2:3]
    ql = qm[:, 3:4]; qv = qm[:, 4:5]
    tx = tm[0:1, :]; ty = tm[1:2, :]; tl = tm[2:3, :]; tv = tm[3:4, :]
    ok = (jnp.abs(qx - tx) <= qr) & (jnp.abs(qy - ty) <= qr)
    ok &= (tl - ql >= float(min_off)) & (tl - ql <= float(max_off))
    ok &= (qv > 0) & (tv > 0)
    dist = jnp.where(ok, dist, 1e9)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_m), 1)
    d1 = jnp.min(dist, axis=1, keepdims=True)
    a1 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    masked = jnp.where(col == a1[:, None], 1e9, dist)
    d2 = jnp.min(masked, axis=1, keepdims=True)

    d1b = jnp.broadcast_to(d1, (tile_n, 128))
    d2b = jnp.broadcast_to(d2, (tile_n, 128))
    a1b = jnp.broadcast_to((a1 + j * tile_m)[:, None], (tile_n, 128))

    cur_best = best_ref[:]
    cur_second = second_ref[:]
    take_new = d1b < cur_best
    best_ref[:] = jnp.minimum(cur_best, d1b)
    second_ref[:] = jnp.where(take_new, jnp.minimum(cur_best, d2b),
                              jnp.minimum(cur_second, d1b))
    idx_ref[:] = jnp.where(take_new, a1b, idx_ref[:])


def search_by_projection_pallas(uv_proj, level_pred, valid_proj, desc_q_pm1,
                                feat_uv, feat_level, feat_desc_pm1, feat_valid,
                                radius, min_off: int = -1, max_off: int = 1,
                                tile_n: int = 256, tile_m: int = 512):
    """Fused projection-guided Hamming search.

    desc_*_pm1: [*, 256] {-1,+1} bf16 codes (ops/orb.unpack_bits_pm1).
    Returns (best [N] f32, second [N] f32, argbest [N] i32, gated by the
    spatial radius, octave window, and validity masks; argbest = -1 when no
    candidate passes). Pads N to tile_n and M to tile_m internally.
    """
    n = desc_q_pm1.shape[0]
    m = feat_desc_pm1.shape[0]
    pn = ((n + tile_n - 1) // tile_n) * tile_n
    pm = ((m + tile_m - 1) // tile_m) * tile_m

    q = jnp.zeros((pn, 256), jnp.bfloat16).at[:n].set(desc_q_pm1)
    t = jnp.zeros((pm, 256), jnp.bfloat16).at[:m].set(feat_desc_pm1)
    qm = jnp.zeros((pn, 128), jnp.float32)
    qm = qm.at[:n, 0].set(uv_proj[:, 0]).at[:n, 1].set(uv_proj[:, 1])
    qm = qm.at[:n, 2].set(radius).at[:n, 3].set(level_pred.astype(jnp.float32))
    qm = qm.at[:n, 4].set(valid_proj.astype(jnp.float32))
    tm = jnp.zeros((8, pm), jnp.float32)
    tm = tm.at[0, :m].set(feat_uv[:, 0]).at[1, :m].set(feat_uv[:, 1])
    tm = tm.at[2, :m].set(feat_level.astype(jnp.float32))
    tm = tm.at[3, :m].set(feat_valid.astype(jnp.float32))

    grid = (pn // tile_n, pm // tile_m)
    kern = functools.partial(_gated_hamming_kernel, tile_n=tile_n,
                             tile_m=tile_m, min_off=min_off, max_off=max_off)
    best, second, idx = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_m), lambda i, j: (0, j),
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
            jax.ShapeDtypeStruct((pn, 128), jnp.float32),
            jax.ShapeDtypeStruct((pn, 128), jnp.float32),
            jax.ShapeDtypeStruct((pn, 128), jnp.int32),
        ],
    )(q, t.T, qm, tm)
    best = best[:n, 0]
    second = second[:n, 0]
    idx = jnp.where(best < 1e9, idx[:n, 0], -1)
    return best, second, idx


def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
