"""Device-time profile of the fused frame step + per-KF mapping step.

Round-3 measurement (VERDICT Weak #4): break the 13.7 ms fused frame into
stages and measure mapping_step device time, to aim optimization where the
trace says. Run on the real TPU:  python tools/profile_stages.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, n=20, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"  {name:42s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_bench_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    from geoflowslam_tpu.io.synthetic import SyntheticWorld, SyntheticSequence, Camera
    from geoflowslam_tpu.state.frame import FrameConfig, build_frame
    from geoflowslam_tpu.ops.extractor import OrbConfig
    from geoflowslam_tpu.pipeline.system import SlamSystem, SystemConfig
    from geoflowslam_tpu.pipeline.inertial import ImuConfig
    from geoflowslam_tpu.pipeline import tracking as T
    from geoflowslam_tpu.pipeline import fused as FU
    from geoflowslam_tpu.state import map_state as M

    cam = Camera()
    orb = OrbConfig(n_features=1000, n_levels=8, height=cam.height,
                    width=cam.width)
    fc = FrameConfig(orb=orb, lk_levels=4, cloud_stride=4, cloud_max_pts=4096)
    imu = ImuConfig(init_min_kfs=4, init_min_time=0.8)
    cfg = SystemConfig(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=40.0,
                       frame=fc, imu=imu, k_max=128, m_max=32768)

    # build a small populated map via the bench cache frames
    cache = "/root/.cache/geoflow_bench_frames_105_640.npz"
    assert os.path.exists(cache), "run bench.py once first"
    z = np.load(cache)
    gray_a, depth_a = z["gray"], z["depth"]
    acc_a, gyro_a, dts_a = z["acc"], z["gyro"], z["dts"]
    slam = SlamSystem(cfg)
    t0 = time.time()
    for i in range(30):
        t = i / 30.0
        if i == 0:
            slam.track_rgbd(gray_a[i], depth_a[i], t)
        else:
            slam.track_rgbd_inertial(gray_a[i], depth_a[i], acc_a[i],
                                     gyro_a[i], dts_a[i], t)
    print(f"warmup 30 frames: {time.time()-t0:.1f}s {slam.map_stats()}",
          file=sys.stderr)

    tcfg, fcfg = slam.tcfg, cfg.frame
    ms = slam.ms
    g = jnp.asarray(gray_a[31], jnp.float32)
    d = jnp.asarray(depth_a[31], jnp.float32)
    masks = slam._local_window_fn(ms, jnp.int32(slam.ref_kf))
    jax.block_until_ready(masks)

    print("== stage breakdown (median-shape inputs, steady map) ==")
    bf = jax.jit(lambda g, d: build_frame(g, d, fcfg, cfg.fx, cfg.fy,
                                          cfg.cx, cfg.cy))
    frame = bf(g, d)
    jax.block_until_ready(frame.feat.uv)
    bench(bf, (g, d), name="build_frame (CLAHE+pyr+FAST+BRIEF+cloud)")

    obs = slam.last_obs_mp
    lvl = slam._last_levels
    r0, t0_ = slam.cur_rot, slam.cur_t
    mm = jax.jit(lambda ms, f, o, r, t: T.track_with_motion_model.__wrapped__(
        ms, f, o, r, t, tcfg, last_levels=lvl))
    res = mm(ms, frame, obs, r0, t0_)
    jax.block_until_ready(res.t)
    bench(mm, (ms, frame, obs, r0, t0_), name="track_with_motion_model")

    lm = jax.jit(lambda ms, f, o, r, t: T.track_local_map.__wrapped__(
        ms, f, o, r, t, jnp.int32(slam.ref_kf), tcfg, local_masks=masks))
    out2 = lm(ms, frame, res.obs_mp, res.rot, res.t)
    jax.block_until_ready(out2[1].t)
    bench(lm, (ms, frame, res.obs_mp, res.rot, res.t), name="track_local_map")

    # full fused step (mode kf)
    im = slam.imu
    args = (g, d, ms, obs, lvl, slam.vel[0], slam.vel[1], np.bool_(True),
            r0, t0_, np.int32(slam.ref_kf), masks,
            np.asarray(acc_a[31], np.float32),
            np.asarray(gyro_a[31], np.float32),
            np.asarray(dts_a[31], np.float32),
            im.body, im.bias, None, im.r_cb, im.t_cb, im.calib)
    fs = lambda *a: FU.frame_step(*a, tcfg, fcfg, "kf", cfg.min_inliers_ok)
    o = fs(*args)
    jax.block_until_ready(o.t)
    bench(fs, args, name="frame_step fused (mode=kf)")

    # mapping_step at the production window
    from geoflowslam_tpu.pipeline import local_mapping as LM
    kw = 8
    slots = im.contiguous_window(kw)
    kw_real = len(slots)
    slots_p = np.asarray(list(slots) + [cfg.k_max] * (kw - kw_real), np.int32)
    slot_valid = np.asarray([i < kw_real for i in range(kw)])
    segs = im.build_segments(list(slots_p))
    free = 100  # any free slot
    mp_args = (ms, frame, res.rot, res.t, np.float32(1.0), res.obs_mp,
               np.int32(slam.ref_kf), np.int32(free),
               im.body.v if im.body is not None else np.zeros(3), im.bias,
               slots_p, slot_valid, segs, im.r_cb, im.t_cb,
               np.asarray(im.walk_info, np.float32), None)
    mp = lambda *a: LM.mapping_step(*a, tcfg, slam.mcfg, kw, True)
    o2 = mp(*mp_args)
    jax.block_until_ready(o2[0].kf_t)
    bench(mp, mp_args, n=10, name="mapping_step (KF+VI-BA+fuse+cull) kw=8")

    # scalar readback cost (tunnel round trip)
    o = fs(*args)
    jax.block_until_ready(o.t)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(o.scalars)
    print(f"  {'scalar read-back (ready array)':42s} "
          f"{(time.perf_counter()-t0)/10*1000:8.2f} ms")

    # dispatch-then-read: what a sync frame pays
    t0 = time.perf_counter()
    for _ in range(10):
        o = fs(*args)
        _ = np.asarray(o.scalars)
    print(f"  {'dispatch + blocking scalar read':42s} "
          f"{(time.perf_counter()-t0)/10*1000:8.2f} ms")

    # dispatch, async-copy, do other dispatch, then read
    t0 = time.perf_counter()
    for _ in range(10):
        o = fs(*args)
        o.scalars.copy_to_host_async()
        o2 = fs(*args)
        _ = np.asarray(o.scalars)
    jax.block_until_ready(o2.t)
    print(f"  {'2x dispatch + async-copy scalar read':42s} "
          f"{(time.perf_counter()-t0)/10*1000:8.2f} ms")


if __name__ == "__main__":
    main()
