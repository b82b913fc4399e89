#!/usr/bin/env python
"""Hard-mode standing benchmark: the parity run in lieu of real datasets.

A long synthetic sequence (default 2000 frames ≈ 66 s) with epoch-scale
timestamps (t0 = 1.4e9 s, the TUM/EuRoC regime), loop revisits every 40 s,
fast-rotation bursts, and periodic texture-poor segments. Reports ATE/RPE,
map health (no capacity eviction, tracking state), and per-KF mapping cost
flatness — the VERDICT round-2 acceptance run.

    python examples/run_hardmode.py [--mode rgbd|rgbd_inertial|mono]
        [--frames 2000] [--out results_hard]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="rgbd_inertial",
                    choices=["rgbd", "rgbd_inertial", "mono"])
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--t0", type=float, default=1.4e9)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--out", default="results_hard")
    ap.add_argument("--loop", action="store_true",
                    help="enable loop closing with the bundled vocabulary")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geoflowslam_tpu.io.synthetic import (SyntheticWorld,
                                              HardSyntheticSequence, Camera)
    from geoflowslam_tpu.pipeline.system import SlamSystem, SystemConfig
    from geoflowslam_tpu.pipeline.loop_closing import LoopConfig
    from geoflowslam_tpu.pipeline.inertial import ImuConfig
    from geoflowslam_tpu.state.frame import FrameConfig
    from geoflowslam_tpu.ops.extractor import OrbConfig
    from geoflowslam_tpu.eval.ate import ate_rmse, rpe

    w, h = args.width, args.height
    cam = Camera(fx=w * 0.625, fy=w * 0.625, cx=w / 2, cy=h / 2,
                 width=w, height=h)
    orb = OrbConfig(n_features=args.features, n_levels=8 if w >= 640 else 4,
                    height=h, width=w)
    fc = FrameConfig(orb=orb, bf=cam.fx * 0.1)
    imu = ImuConfig() if args.mode == "rgbd_inertial" else None
    vocab = None
    loop_cfg = None
    if args.loop:
        from geoflowslam_tpu.retrieval.vocab import default_vocabulary
        vocab = default_vocabulary()
        loop_cfg = LoopConfig()
    cfg = SystemConfig(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                       bf=cam.fx * 0.1, frame=fc, imu=imu, loop=loop_cfg,
                       sensor="mono" if args.mode == "mono" else "rgbd")
    world = SyntheticWorld(cam)
    seq = HardSyntheticSequence(world, fps=args.fps)
    slam = SlamSystem(cfg, vocab=vocab)

    gt, last_t = [], None
    kf_costs = []
    t_start = time.time()
    for i in range(args.frames):
        ts = i / args.fps                 # sim time for rendering
        t_abs = args.t0 + ts              # epoch stamp fed to the system
        gray, depth, (rot_cw, t_cw) = seq.frame(ts)
        n_kf_before = slam.map_stats()["n_kfs"]
        tk0 = time.time()
        if args.mode == "mono":
            slam.track_monocular(gray, t_abs)
        elif args.mode == "rgbd_inertial" and last_t is not None:
            acc, gyro, dts = seq.imu_between(last_t, ts, 32)
            slam.track_rgbd_inertial(gray, depth, acc, gyro, dts, t_abs)
        else:
            slam.track_rgbd(gray, depth, t_abs)
        tk = time.time() - tk0
        if slam.map_stats()["n_kfs"] != n_kf_before:
            kf_costs.append((i, tk))
        last_t = ts
        twc = np.eye(4)
        rwc = np.asarray(rot_cw).T
        twc[:3, :3] = rwc
        twc[:3, 3] = -rwc @ np.asarray(t_cw)
        gt.append((t_abs, twc))
        if i % 200 == 0:
            st = slam.map_stats()
            print(f"frame {i}: {st} ({i/max(time.time()-t_start,1e-9):.1f} "
                  "fps cum)", file=sys.stderr)

    wall = time.time() - t_start
    st = slam.map_stats()
    m = ate_rmse(slam.trajectory, gt, with_scale=(args.mode == "mono"))
    r = rpe(slam.trajectory, gt)
    # per-KF cost flatness: late-half mean vs early-half mean
    if len(kf_costs) >= 8:
        half = len(kf_costs) // 2
        early = np.mean([c for _, c in kf_costs[1:half]])
        late = np.mean([c for _, c in kf_costs[half:]])
    else:
        early = late = float("nan")
    print(f"{args.frames} frames in {wall:.1f}s ({args.frames/wall:.1f} FPS)")
    print(f"map: {st} | loops: "
          f"{slam.loop_closer.n_loops if slam.loop_closer else 0}")
    print(f"ATE rmse {m['ate_rmse']*100:.2f} cm | RPE {r['rpe_trans']*100:.2f}"
          f" cm / {r['rpe_rot_deg']:.3f} deg")
    print(f"per-KF cost: early {early*1000:.1f} ms, late {late*1000:.1f} ms "
          f"(flat = no O(K) growth)")
    os.makedirs(args.out, exist_ok=True)
    slam.shutdown(args.out)
    import json
    with open(os.path.join(args.out, "hardmode.json"), "w") as f:
        json.dump({"mode": args.mode, "frames": args.frames,
                   "ate_rmse_m": m["ate_rmse"], "rpe_trans_m": r["rpe_trans"],
                   "rpe_rot_deg": r["rpe_rot_deg"], "map": st,
                   "kf_cost_early_ms": early * 1000,
                   "kf_cost_late_ms": late * 1000, "fps": args.frames / wall},
                  f, indent=1)


if __name__ == "__main__":
    main()
