#!/usr/bin/env python
"""Bisect which hard-mode ingredient breaks the OF/ICP rescue.

Context (round 4): the real-chip `rgbd_of_icp` matrix cell loses tracking
at t≈0.8-1.9 s (inliers collapse while contrast is still >=0.6), while
`tests/test_hardmode_ab.py` — same switches, 320x240 / 6 fps / raw feed /
icp_min=100 — holds ATE < 0.15 m. Each variant here flips ONE ingredient
from the passing A/B operating point toward the failing run_hardmode
config (640x480 / 30 fps / 8 ORB levels / 4 LK levels / m12 feed /
icp_min=200 / k128/m32k / 1000 features / 4096-pt cloud @ stride 4).

Run on the host CPU (does not touch the TPU):

    python tools/bisect_of_icp.py

NOTE the sitecustomize gotcha: JAX_PLATFORMS=cpu in the environment is NOT
enough — /root/.axon_site/sitecustomize.py force-sets jax_platforms back to
"axon,cpu" at interpreter start, so the CPU pin must happen via
jax.config.update AFTER importing jax (exactly like tests/conftest.py).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
jax.config.update("jax_platforms", "cpu")   # see module docstring
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from geoflowslam_tpu.io.synthetic import (SyntheticWorld,
                                          HardSyntheticSequence, Camera)
from geoflowslam_tpu.pipeline.system import SlamSystem, SystemConfig
from geoflowslam_tpu.state.frame import FrameConfig
from geoflowslam_tpu.ops.extractor import OrbConfig
from geoflowslam_tpu.eval.ate import ate_rmse
from geoflowslam_tpu.io.feed_codec import pack_m12


def run(tag, fps=30.0, n_frames=75, orb_levels=4, lk_levels=3,
        feed="raw", icp_min=100, kmax=32, mmax=8192, n_feat=400,
        cloud_pts=1024, cloud_stride=8):
    w, h = 320, 240
    cam = Camera(fx=200.0, fy=200.0, cx=w / 2, cy=h / 2, width=w, height=h)
    orb = OrbConfig(n_features=n_feat, n_levels=orb_levels, height=h, width=w)
    fc = FrameConfig(orb=orb, lk_levels=lk_levels, cloud_stride=cloud_stride,
                     cloud_max_pts=cloud_pts, bf=20.0, n_of_slots=256,
                     feed_codec=feed)
    cfg = SystemConfig(fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=20.0,
                       frame=fc, k_max=kmax, m_max=mmax,
                       use_of=True, use_icp=True, icp_min_inliers=icp_min)
    world = SyntheticWorld(cam)
    seq = HardSyntheticSequence(world, fps=fps)
    slam = SlamSystem(cfg)
    gt = []
    for i in range(n_frames):
        t = i / fps
        gray, depth, (rot_cw, t_cw) = seq.frame(t)
        if feed == "m12":
            buf = pack_m12(np.asarray(gray), np.asarray(depth), 1.0)
            slam.track_rgbd(buf, None, t)
        else:
            slam.track_rgbd(gray, depth, t)
        twc = np.eye(4)
        rwc = np.asarray(rot_cw).T
        twc[:3, :3] = rwc
        twc[:3, 3] = -rwc @ np.asarray(t_cw)
        gt.append((t, twc))
    st = slam.map_stats()
    m = ate_rmse(slam.trajectory, gt)
    il = slam.inlier_log[-6:]
    print(f"{tag:28s} state={st['state']:13s} maps={st['n_maps']} "
          f"lost={slam.n_lost:3d} ate={m['ate_rmse']*100:6.2f}cm "
          f"tail_inliers={[r[2] for r in il]}", flush=True)


if __name__ == "__main__":
    run("baseline(AB,30fps)")
    run("orb8", orb_levels=8)
    run("lk4", lk_levels=4)
    run("orb8+lk4", orb_levels=8, lk_levels=4)
    run("m12", feed="m12")
    run("icp_min200", icp_min=200)
    run("kmax128", kmax=128, mmax=32768)
    run("cloud4096s4", cloud_pts=4096, cloud_stride=4)
    run("feat1000", n_feat=1000)
