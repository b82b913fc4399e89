"""Benchmark: RGB-D tracking hot path on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the per-frame device pipeline at the reference's flagship operating
point (640x480 RGB-D, 1000 ORB features — Camera.width/height and
ORBextractor.nFeatures in the reference's G1/Go2 configs): frame build
(CLAHE + pyramid + FAST + rBRIEF + depth cloud) -> motion-model projection
tracking (Hamming matmul search + pose-only GN) -> local-map tracking.
FPS = frames/sec of the full per-frame device work, the reference's
ExecTimeMean "Total Tracking" analogue. Baseline = 60 FPS north star
(BASELINE.md: >=60 FPS RGB-D-inertial tracking on one TPU v5e core).

Runs on the default platform (the tunneled TPU chip); falls back to CPU
gracefully so the script always emits its JSON line.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    from geoflowslam_tpu.io.synthetic import SyntheticWorld, SyntheticSequence, Camera
    from geoflowslam_tpu.state.frame import FrameConfig, build_frame
    from geoflowslam_tpu.ops.extractor import OrbConfig
    from geoflowslam_tpu.pipeline import tracking as T
    from geoflowslam_tpu.state import map_state as M

    cam = Camera()  # 640x480, fx 400
    orb = OrbConfig(n_features=1000, n_levels=8, height=cam.height, width=cam.width)
    fc = FrameConfig(orb=orb, lk_levels=4, cloud_stride=4, cloud_max_pts=4096)
    tcfg = T.TrackConfig(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=40.0,
                         n_levels=8, scale_factor=1.2)

    world = SyntheticWorld(cam)
    seq = SyntheticSequence(world, fps=30.0)

    bf_fn = jax.jit(lambda g, d: build_frame(g, d, fc, cam.fx, cam.fy, cam.cx, cam.cy))

    # Bootstrap: render 2 frames, init the map from frame 0.
    t0 = time.time()
    gray0, depth0, _ = seq.frame(0.0)
    gray1, depth1, _ = seq.frame(1.0 / 30.0)
    frame0 = bf_fn(gray0, depth0)
    jax.block_until_ready(frame0.feat.uv)
    ms = M.create(32, orb.n_features, 16384)
    ms, kf_slot, res = T.stereo_initialization(ms, frame0, jnp.float32(0.0), tcfg)
    jax.block_until_ready(ms.mp_pos)
    print(f"setup+compile(frame,init): {time.time()-t0:.1f}s, "
          f"init pts {int(res.n_inliers)}", file=sys.stderr)

    frame1 = bf_fn(gray1, depth1)
    # Warm up the tracking stages (compile).
    t0 = time.time()
    r1 = T.track_with_motion_model(ms, frame1, res.obs_mp, res.rot, res.t, tcfg)
    ms2, r2 = T.track_local_map(ms, frame1, r1.obs_mp, r1.rot, r1.t,
                                jnp.int32(kf_slot), tcfg)
    jax.block_until_ready(r2.t)
    print(f"compile(track): {time.time()-t0:.1f}s, inliers {int(r2.n_inliers)}",
          file=sys.stderr)

    # Fused single-dispatch per-frame step (production low-latency path).
    t0 = time.time()
    f3, r3, ms3 = T.fused_track_step(gray1, depth1, ms, res.obs_mp, res.rot,
                                     res.t, jnp.int32(kf_slot), tcfg, fc)
    jax.block_until_ready(r3.t)
    print(f"compile(fused): {time.time()-t0:.1f}s, inliers {int(r3.n_inliers)}",
          file=sys.stderr)

    # Timed loop: full per-frame device work, N iterations.
    n = 50
    grays = [gray0, gray1]
    depths = [depth0, depth1]
    t0 = time.time()
    for i in range(n):
        g = grays[i % 2]
        d = depths[i % 2]
        _, r2, _ = T.fused_track_step(g, d, ms, res.obs_mp, res.rot, res.t,
                                      jnp.int32(kf_slot), tcfg, fc)
    jax.block_until_ready(r2.t)
    dt = time.time() - t0
    fps = n / dt
    print(f"{n} frames in {dt:.3f}s -> {fps:.1f} FPS "
          f"({1000*dt/n:.2f} ms/frame)", file=sys.stderr)

    baseline_fps = 60.0
    print(json.dumps({
        "metric": "rgbd_track_fps_640x480_1000feat",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit the JSON line
        import traceback
        traceback.print_exc()
        print(json.dumps({
            "metric": "rgbd_track_fps_640x480_1000feat",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
