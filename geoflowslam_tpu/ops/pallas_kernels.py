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


# ---------------------------------------------------------------------------
# Pyramidal Lucas-Kanade: one level, all points, all GN iterations in-kernel
# ---------------------------------------------------------------------------

_LK_B = 8     # points per grid cell (unrolled)


def _lk_level_kernel(pts_ref, guess_ref, imgp_ref, imgn_ref, out_ref, *,
                     win, iters, min_eig, pad, h, w):
    """One grid cell tracks _LK_B points through `iters` GN iterations.

    Both (pre-padded) level images are VMEM-resident; every patch access is
    a dynamic slice FROM VMEM — the XLA formulation's per-iteration HBM
    block-gather (the measured 21.5 ms/iteration at N=1256) becomes on-chip
    traffic. Out rows: (x, y, ok, err)."""
    hp = h + 2 * pad
    wp_img = imgp_ref.shape[1]
    r = win // 2
    _RB = 32               # row-aligned load height (patch + 7-row shift)
    _LB = min(256, wp_img)  # lane-aligned load width (patch + 127-lane shift)

    def _load_blend(img_ref, x, y, fx, fy, n_out):
        """Bilinear [n_out, n_out] patch at float position implied by
        (integer corner x,y = top-left of the n_out+1 span; fractions
        fx,fy). Mosaic constrains dynamic starts to tile multiples
        (sublane 8, lane 128), so the load is tile-aligned and the
        residual (row, col) shifts PLUS the fractional bilinear blend fold
        into two one-hot band matmuls on the MXU:
            out = Wr(ro, fy) @ block @ Wc(co, fx).
        """
        # align-last so Mosaic can statically prove the tile multiples
        # (divisibility does not propagate through clip)
        y_al = (jnp.clip(y, 0, hp - _RB) // 8) * 8
        x_al = (jnp.clip(x, 0, wp_img - _LB) // 128) * 128
        # residual shifts, clamped so border-clamped loads still select a
        # real band (out-of-image points produce finite garbage and fail
        # the status gates, as in the XLA fallback)
        ro = jnp.clip(y - y_al, 0, _RB - n_out - 1)
        co = jnp.clip(x - x_al, 0, _LB - n_out - 1)
        block = img_ref[pl.ds(y_al, _RB), pl.ds(x_al, _LB)]   # [32, _LB]
        i = jax.lax.broadcasted_iota(jnp.int32, (n_out, _RB), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n_out, _RB), 1)
        wr = ((j == i + ro).astype(jnp.float32) * (1.0 - fy)
              + (j == i + ro + 1).astype(jnp.float32) * fy)
        jc = jax.lax.broadcasted_iota(jnp.int32, (_LB, n_out), 0)
        kc = jax.lax.broadcasted_iota(jnp.int32, (_LB, n_out), 1)
        wc = ((jc == kc + co).astype(jnp.float32) * (1.0 - fx)
              + (jc == kc + co + 1).astype(jnp.float32) * fx)
        tmp = jax.lax.dot_general(block, wc, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return jax.lax.dot_general(wr, tmp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    rows = []
    for b in range(_LK_B):
        px = pts_ref[b, 0]
        py = pts_ref[b, 1]
        bx_i = jnp.floor(px).astype(jnp.int32)
        by_i = jnp.floor(py).astype(jnp.int32)
        fx = px - bx_i.astype(jnp.float32)
        fy = py - by_i.astype(jnp.float32)
        # template + gradients: bilinear samples at offsets -(r+1)..(r+1)
        interp = _load_blend(imgp_ref, bx_i - (r + 1) + pad,
                             by_i - (r + 1) + pad, fx, fy, win + 2)
        tmpl = interp[1:-1, 1:-1]                               # [win, win]
        gix = 0.5 * (interp[1:-1, 2:] - interp[1:-1, :-2])
        giy = 0.5 * (interp[2:, 1:-1] - interp[:-2, 1:-1])
        gxx = jnp.sum(gix * gix)
        gxy = jnp.sum(gix * giy)
        gyy = jnp.sum(giy * giy)
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good = eig_min / (win * win) > min_eig
        det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)

        def sample_cur(gx, gy):
            bxc = jnp.floor(gx).astype(jnp.int32)
            byc = jnp.floor(gy).astype(jnp.int32)
            fxc = gx - bxc.astype(jnp.float32)
            fyc = gy - byc.astype(jnp.float32)
            return _load_blend(imgn_ref, bxc - r + pad, byc - r + pad,
                               fxc, fyc, win)

        def body(_, g):
            gx, gy = g
            di = sample_cur(gx, gy) - tmpl
            bxs = jnp.sum(di * gix)
            bys = jnp.sum(di * giy)
            sx = -(gyy * bxs - gxy * bys) / det_safe
            sy = -(-gxy * bxs + gxx * bys) / det_safe
            gx = gx + jnp.where(good, sx, 0.0)
            gy = gy + jnp.where(good, sy, 0.0)
            return gx, gy

        g0 = (guess_ref[b, 0], guess_ref[b, 1])
        gx, gy = jax.lax.fori_loop(0, iters, body, g0)
        err = jnp.mean(jnp.abs(sample_cur(gx, gy) - tmpl))
        inb = (gx >= 0) & (gx <= w - 1) & (gy >= 0) & (gy <= h - 1)
        ok = (good & inb).astype(jnp.float32)
        rows.append(jnp.stack([gx, gy, ok, err]))
    out_ref[:] = jnp.stack(rows)                                # [_LK_B, 4]


def klt_supported(h: int, w: int, win: int) -> bool:
    pad = win // 2 + 2
    wp = (((w + 2 * pad) + 127) // 128) * 128
    return (h + 2 * pad) * wp * 4 * 2 < 10 * 2 ** 20


def lk_level_pallas(img_prev: jnp.ndarray, img_next: jnp.ndarray,
                    pts: jnp.ndarray, guess: jnp.ndarray,
                    win: int, iters: int, min_eig: float):
    """Track all pts one pyramid level (LK GN): returns (pts_out [N,2],
    ok [N] bool, err [N]). Numerics match ops/klt._track_level (same
    patch/bilinear formulation, edge-replicated borders)."""
    h, w = img_prev.shape
    n = pts.shape[0]
    pad = win // 2 + 2
    wp = (((w + 2 * pad) + 127) // 128) * 128
    imgp = jnp.pad(img_prev, ((pad, pad), (pad, wp - w - pad)), mode="edge")
    imgn = jnp.pad(img_next, ((pad, pad), (pad, wp - w - pad)), mode="edge")
    pn = ((n + _LK_B - 1) // _LK_B) * _LK_B
    pts_p = jnp.pad(pts, ((0, pn - n), (0, 0)))
    guess_p = jnp.pad(guess, ((0, pn - n), (0, 0)))

    kern = functools.partial(_lk_level_kernel, win=win, iters=iters,
                             min_eig=float(min_eig), pad=pad, h=h, w=w)
    out = pl.pallas_call(
        kern,
        grid=(pn // _LK_B,),
        in_specs=[
            pl.BlockSpec((_LK_B, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LK_B, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole padded prev
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole padded next
        ],
        out_specs=pl.BlockSpec((_LK_B, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pn, 4), jnp.float32),
    )(pts_p, guess_p, imgp, imgn)
    return out[:n, :2], out[:n, 2] > 0.5, out[:n, 3]


def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
