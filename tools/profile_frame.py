"""Sub-profile of build_frame internals on the real TPU (round-3 item 6)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, n=30, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"  {name:46s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_bench_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    from geoflowslam_tpu.state.frame import FrameConfig, build_frame
    from geoflowslam_tpu.ops.extractor import OrbConfig, extract
    from geoflowslam_tpu.ops import pyramid as pyr_ops
    from geoflowslam_tpu.ops import fast as fast_ops
    from geoflowslam_tpu.ops import orb as orb_ops
    from geoflowslam_tpu.ops import klt as klt_ops
    from geoflowslam_tpu.ops import pointcloud as pc

    cache = "/root/.cache/geoflow_bench_frames_105_640.npz"
    z = np.load(cache)
    g = jnp.asarray(z["gray"][31], jnp.float32)
    d = jnp.asarray(z["depth"][31], jnp.float32)
    fx = fy = 400.0
    cx, cy = 320.0, 240.0

    orb = OrbConfig(n_features=1000, n_levels=8, height=480, width=640)
    fc = FrameConfig(orb=orb, lk_levels=4, cloud_stride=4, cloud_max_pts=4096)

    print("== build_frame sub-stages ==")
    f_clahe = jax.jit(pyr_ops.clahe)
    img = f_clahe(g)
    jax.block_until_ready(img)
    bench(f_clahe, (g,), name="clahe")

    f_pyr = jax.jit(lambda im: pyr_ops.build_pyramid(im, orb.n_levels,
                                                     orb.scale_factor))
    levels = f_pyr(img)
    jax.block_until_ready(levels)
    bench(f_pyr, (img,), name="build_pyramid (8 lvls)")

    quotas = orb.per_level_quota()
    # level 0 FAST alone, then all-level FAST
    f_fast0 = jax.jit(lambda im: fast_ops.detect_level(
        im, quotas[0], orb.ini_th_fast, orb.min_th_fast,
        cell_size=orb.cell_size, per_cell_cap=orb.per_cell_cap))
    kp0 = f_fast0(levels[0])
    jax.block_until_ready(kp0.xy)
    bench(f_fast0, (levels[0],), name=f"FAST level0 (quota {quotas[0]})")

    def all_fast(levels):
        outs = []
        for lvl, (li, q) in enumerate(zip(levels, quotas)):
            if q == 0:
                continue
            outs.append(fast_ops.detect_level(
                li, q, orb.ini_th_fast, orb.min_th_fast,
                cell_size=orb.cell_size, per_cell_cap=orb.per_cell_cap).xy)
        return outs
    f_allfast = jax.jit(all_fast)
    o = f_allfast(levels)
    jax.block_until_ready(o)
    bench(f_allfast, (levels,), name="FAST all 8 levels")

    f_ori = jax.jit(lambda im, xy: orb_ops.compute_orientations(im, xy))
    a0 = f_ori(levels[0], kp0.xy)
    jax.block_until_ready(a0)
    bench(f_ori, (levels[0], kp0.xy), name="orientation level0")

    f_blur = jax.jit(pyr_ops.gaussian_blur)
    b0 = f_blur(levels[0])
    jax.block_until_ready(b0)
    bench(f_blur, (levels[0],), name="gaussian_blur level0")

    f_desc = jax.jit(lambda im, xy, a: orb_ops.compute_descriptors(im, xy, a))
    d0 = f_desc(b0, kp0.xy, a0)
    jax.block_until_ready(d0)
    bench(f_desc, (b0, kp0.xy, a0), name="BRIEF level0")

    def ori_blur_desc_all(levels, xys):
        outs = []
        for li, xy in zip(levels, xys):
            a = orb_ops.compute_orientations(li, xy)
            b = pyr_ops.gaussian_blur(li)
            outs.append(orb_ops.compute_descriptors(b, xy, a))
        return outs
    f_obd = jax.jit(ori_blur_desc_all)
    o2 = f_obd(levels, o)
    jax.block_until_ready(o2)
    bench(f_obd, (levels, o), name="orient+blur+BRIEF all levels")

    f_ext = jax.jit(lambda im: extract(im, orb))
    fs = f_ext(img)
    jax.block_until_ready(fs.uv)
    bench(f_ext, (img,), name="extract() total")

    f_cloud = jax.jit(lambda dd: pc.depth_to_cloud(
        dd, fx, fy, cx, cy, stride=fc.cloud_stride, max_depth=fc.max_depth))
    cl = f_cloud(d)
    jax.block_until_ready(cl)
    bench(f_cloud, (d,), name="depth_to_cloud")

    f_vox = jax.jit(lambda p, m: pc.voxel_downsample(
        p, m, fc.cloud_voxel, fc.cloud_max_pts))
    vx = f_vox(*cl)
    jax.block_until_ready(vx)
    bench(f_vox, cl, name="voxel_downsample")

    f_lk = jax.jit(lambda im: tuple(klt_ops.build_lk_pyramid(im, fc.lk_levels)))
    lk = f_lk(img)
    jax.block_until_ready(lk)
    bench(f_lk, (img,), name="build_lk_pyramid")

    f_bf = jax.jit(lambda gg, dd: build_frame(gg, dd, fc, fx, fy, cx, cy))
    fr = f_bf(g, d)
    jax.block_until_ready(fr.feat.uv)
    bench(f_bf, (g, d), name="build_frame total")


if __name__ == "__main__":
    main()
