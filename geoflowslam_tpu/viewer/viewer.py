"""Lightweight visualization: map view + frame HUD.

Replacement for the Pangolin/OpenCV viewer stack
(/root/reference/src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc): instead of an
OpenGL thread, headless matplotlib renderings (PNG snapshots or an
interactive window when a display exists) of

* MapDrawer::DrawMapPoints/DrawKeyFrames — 3D scatter of valid map points +
  KF frusta + the current camera (incl. the separate ICP-pose camera when
  ICP prediction is on, MapDrawer::DrawCurrentCameraICP),
* FrameDrawer::DrawFrame — the current image with tracked keypoints
  overlaid (green = map-point inliers, blue = unmatched detections).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _frustum(rot_cw, t_cw, scale=0.1):
    """Camera frustum line segments in world coords."""
    rwc = rot_cw.T
    c = -rwc @ t_cw
    pts = np.array([[0, 0, 0], [-1, -0.75, 1.5], [1, -0.75, 1.5],
                    [1, 0.75, 1.5], [-1, 0.75, 1.5]]) * scale
    w = pts @ rwc.T + c
    segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(w[a], w[b]) for a, b in segs]


class Viewer:
    def __init__(self, out_dir: Optional[str] = None):
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self.n = 0

    def draw_map(self, ms, cur_rot=None, cur_t=None, icp_rot=None, icp_t=None,
                 path: Optional[str] = None):
        """MapDrawer analogue; saves a PNG and returns its path."""
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        mp = np.asarray(ms.mp_pos)[np.asarray(ms.mp_valid)]
        if len(mp):
            ax.scatter(mp[:, 0], mp[:, 2], -mp[:, 1], s=0.5, c="k", alpha=0.4)
        kf_valid = np.asarray(ms.kf_valid)
        rots = np.asarray(ms.kf_rot)
        ts = np.asarray(ms.kf_t)
        for k in range(len(kf_valid)):
            if not kf_valid[k]:
                continue
            for a, b in _frustum(rots[k], ts[k], 0.05):
                ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                        c="b", lw=0.5)
        if cur_rot is not None:
            for a, b in _frustum(np.asarray(cur_rot), np.asarray(cur_t), 0.08):
                ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]], c="g", lw=1.2)
        if icp_rot is not None:
            for a, b in _frustum(np.asarray(icp_rot), np.asarray(icp_t), 0.08):
                ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]], c="r", lw=0.8)
        ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
        out = path or (os.path.join(self.out_dir or ".", f"map_{self.n:05d}.png"))
        fig.savefig(out, dpi=90)
        plt.close(fig)
        self.n += 1
        return out

    def draw_frame(self, gray, feat_uv, feat_valid, obs_mp,
                   path: Optional[str] = None):
        """FrameDrawer analogue: keypoint overlay HUD."""
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(np.asarray(gray), cmap="gray", vmin=0, vmax=255)
        uv = np.asarray(feat_uv)
        valid = np.asarray(feat_valid)
        matched = np.asarray(obs_mp) >= 0 if obs_mp is not None else \
            np.zeros(len(uv), bool)
        ax.scatter(uv[valid & ~matched, 0], uv[valid & ~matched, 1],
                   s=6, facecolors="none", edgecolors="b", lw=0.6)
        ax.scatter(uv[valid & matched, 0], uv[valid & matched, 1],
                   s=8, facecolors="none", edgecolors="lime", lw=0.8)
        ax.set_title(f"tracked {int((valid & matched).sum())} / "
                     f"{int(valid.sum())} kps")
        ax.axis("off")
        out = path or (os.path.join(self.out_dir or ".", f"frame_{self.n:05d}.png"))
        fig.savefig(out, dpi=90, bbox_inches="tight")
        plt.close(fig)
        return out


class LiveViewer:
    """Incremental during-run view (Viewer::Run's role,
    /root/reference/src/Viewer.cc:159): one persistent figure — 3D map +
    trajectory on the left (MapDrawer), current-frame keypoint HUD on the
    right (FrameDrawer::DrawFrame, src/FrameDrawer.cc:38) — refreshed on a
    per-KF cadence during the run, not post-hoc. Headless-friendly: each
    refresh writes view_%05d.png under `out_dir`; `finish()` assembles the
    frames into an animated GIF. With an interactive backend the same figure
    shows live (plt.pause), matching the reference's always-on viewer
    thread."""

    def __init__(self, out_dir: str, interactive: bool = False):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.interactive = interactive
        self.fig = plt.figure(figsize=(12, 5))
        self.ax_map = self.fig.add_subplot(121, projection="3d")
        self.ax_img = self.fig.add_subplot(122)
        self.traj = []
        self.n = 0

    def update(self, ms, cur_rot, cur_t, gray=None, feat_uv=None,
               feat_valid=None, obs_mp=None, title: str = ""):
        """Redraw both panels from the current MapState + frame."""
        c = -np.asarray(cur_rot).T @ np.asarray(cur_t)
        self.traj.append(c)
        ax = self.ax_map
        ax.cla()
        mp = np.asarray(ms.mp_pos)[np.asarray(ms.mp_valid)]
        if len(mp):
            ax.scatter(mp[:, 0], mp[:, 2], -mp[:, 1], s=0.4, c="k", alpha=0.35)
        kf_valid = np.asarray(ms.kf_valid)
        rots, ts = np.asarray(ms.kf_rot), np.asarray(ms.kf_t)
        for k in np.nonzero(kf_valid)[0]:
            for a, b in _frustum(rots[k], ts[k], 0.05):
                ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                        c="b", lw=0.4)
        tr = np.asarray(self.traj)
        ax.plot(tr[:, 0], tr[:, 2], -tr[:, 1], c="g", lw=1.0)
        for a, b in _frustum(np.asarray(cur_rot), np.asarray(cur_t), 0.08):
            ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]], c="g", lw=1.2)
        ax.set_title(title or f"KFs {int(kf_valid.sum())}  "
                     f"MPs {len(mp)}")

        if gray is not None:
            axi = self.ax_img
            axi.cla()
            axi.imshow(np.asarray(gray), cmap="gray", vmin=0, vmax=255)
            if feat_uv is not None:
                uv = np.asarray(feat_uv)
                valid = np.asarray(feat_valid)
                matched = (np.asarray(obs_mp) >= 0) if obs_mp is not None \
                    else np.zeros(len(uv), bool)
                axi.scatter(uv[valid & ~matched, 0], uv[valid & ~matched, 1],
                            s=5, facecolors="none", edgecolors="b", lw=0.5)
                axi.scatter(uv[valid & matched, 0], uv[valid & matched, 1],
                            s=7, facecolors="none", edgecolors="lime", lw=0.7)
                axi.set_title(f"tracked {int((valid & matched).sum())} / "
                              f"{int(valid.sum())}")
            axi.axis("off")

        out = os.path.join(self.out_dir, f"view_{self.n:05d}.png")
        self.fig.savefig(out, dpi=80)
        if self.interactive:
            plt.pause(0.001)
        self.n += 1
        return out

    def finish(self, gif_name: str = "run.gif", fps: int = 4):
        """Assemble the per-KF frames into an animated GIF."""
        try:
            from PIL import Image
        except ImportError:
            return None
        paths = sorted(
            os.path.join(self.out_dir, p) for p in os.listdir(self.out_dir)
            if p.startswith("view_") and p.endswith(".png"))
        if not paths:
            return None
        frames = [Image.open(p) for p in paths]
        out = os.path.join(self.out_dir, gif_name)
        frames[0].save(out, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
        plt.close(self.fig)
        return out
