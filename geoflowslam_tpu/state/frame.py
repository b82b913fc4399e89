"""Frame construction: images -> padded feature/depth/cloud pytree.

TPU-native replacement for the Frame class
(/root/reference/src/Frame.cc RGB-D ctor :304-456): CLAHE, ORB extraction,
depth association (ComputeStereoFromRGBD :1314), depth-cloud conversion
(ConvertDepthToPointCloud :590) and the LK pyramid build (:373) — emitted as
one jit-compiled function returning a fixed-shape FrameData pytree.

The reference's on-demand feature append (AddPts/AddFeatures for the OF
tracker, Frame.cc:625-732) is handled by reserving extra padded keypoint
slots (`n_extra`) that the OF stage fills in-place.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from geoflowslam_tpu.ops import pyramid as pyr_ops
from geoflowslam_tpu.ops import klt as klt_ops
from geoflowslam_tpu.ops.extractor import OrbConfig, FeatureSet, extract
from geoflowslam_tpu.ops import pointcloud as pc


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    orb: OrbConfig = OrbConfig()
    use_clahe: bool = True
    lk_levels: int = 4
    cloud_stride: int = 4
    cloud_max_pts: int = 4096
    cloud_voxel: float = 0.05
    max_depth: float = 10.0
    # stereo/RGBD baseline*fx (mbf); 0 for mono
    bf: float = 40.0
    depth_map_factor: float = 1.0
    # reserved padded keypoint slots for the optical-flow tracker's
    # appended points (Frame::AddPts analogue); 0 disables
    n_of_slots: int = 0
    # camera model for keypoint undistortion (Frame::UndistortKeyPoints):
    # "pinhole" (optionally with radtan dist_params [k1,k2,p1,p2,(k3)]) or
    # "kb8" (dist_params = [k0..k3] theta-polynomial). Downstream geometry
    # always sees ideal-pinhole keypoints, exactly like the reference.
    camera_model: str = "pinhole"
    dist_params: tuple = ()
    # SSL_SLAM2 edge/surf feature extraction on the depth cloud before the
    # voxel filter (LaserProcessing in the RGB-D Frame ctor, Frame.cc:374-394)
    # — enabled by the system when UsePointCloudObs is on
    lidar_features: bool = False
    # host->device frame wire format: "raw" uploads gray/depth as given;
    # "m12" packs gray u8 + 12-bit depth into one buffer on the host
    # (io/feed_codec) and unpacks on device — 0.75 MB/frame vs 2.4 MB,
    # for bandwidth-constrained accelerator links
    feed_codec: str = "raw"


class FrameData(NamedTuple):
    feat: FeatureSet            # padded keypoints + descriptors
    depth_kp: jnp.ndarray       # [N] depth per keypoint (<=0 invalid)
    u_right: jnp.ndarray        # [N] virtual right-cam u (RGBD), <0 invalid
    cloud: jnp.ndarray          # [P,3] voxel-downsampled depth cloud (cam frame)
    cloud_valid: jnp.ndarray    # [P]
    lk_pyramid: Tuple[jnp.ndarray, ...]  # LK pyramid of the (CLAHE) gray image
    # metric depth image, retained only when OF slots are reserved so the OF
    # stage can sample depth for appended points (Frame::AddPts samples the
    # depth map, /root/reference/src/Frame.cc:625-674); None otherwise
    depth_img: Optional[jnp.ndarray] = None


def build_frame(gray: jnp.ndarray, depth: Optional[jnp.ndarray],
                cfg: FrameConfig, fx, fy, cx, cy) -> FrameData:
    """gray: [H,W] 0..255; depth: [H,W] depth (x depth_map_factor) or None.

    Accepts sensor-native dtypes (uint8 gray, uint16 depth — the reference's
    cv 8UC1/16UC1 inputs, Frame.cc:304 + DepthMapFactor) and casts ON DEVICE:
    the host uploads raw sensor bytes, 4x less host->device traffic than
    pre-converted float32 — on a bandwidth-constrained accelerator link the
    image feed is the frame budget's biggest line item."""
    if gray.ndim == 1:
        # packed single-buffer wire feed (io/feed_codec.pack_m12): unpack
        # on device so XLA fuses it into the first image op. Depth emerges
        # in INPUT units (q * 4 mm / depth_map_factor) so the metric
        # scaling below stays uniform across feed modes.
        h, w = cfg.orb.height, cfg.orb.width
        p = gray[h * w:].reshape(h, w // 2, 3).astype(jnp.uint32)
        a = p[..., 0] | ((p[..., 1] & 0xF) << 8)
        b = (p[..., 1] >> 4) | (p[..., 2] << 4)
        q = jnp.stack([a, b], -1).reshape(h, w).astype(jnp.float32)
        depth = q * (0.004 / cfg.depth_map_factor)
        gray = gray[:h * w].reshape(h, w)
    gray = gray.astype(jnp.float32)
    if depth is not None and depth.dtype != jnp.float32:
        depth = depth.astype(jnp.float32)
    img = pyr_ops.clahe(gray) if cfg.use_clahe else gray
    feat = extract(img, cfg.orb)
    n = feat.capacity

    raw_uv = feat.uv  # distorted pixel coords (for depth/image lookups)
    if cfg.camera_model == "kb8" and cfg.dist_params:
        from geoflowslam_tpu.math import cameras as CAM
        params = jnp.asarray([fx, fy, cx, cy, *cfg.dist_params], jnp.float32)
        rays = CAM.kb8_unproject(params, feat.uv)
        u = fx * rays[:, 0] / rays[:, 2] + cx
        v = fy * rays[:, 1] / rays[:, 2] + cy
        feat = feat._replace(uv=jnp.stack([u, v], axis=1))
    elif cfg.dist_params:
        from geoflowslam_tpu.math import cameras as CAM
        dist = jnp.asarray(cfg.dist_params, jnp.float32)
        xy = (feat.uv - jnp.asarray([cx, cy])) / jnp.asarray([fx, fy])
        xyu = CAM.radtan_undistort(dist, xy)
        feat = feat._replace(
            uv=xyu * jnp.asarray([fx, fy]) + jnp.asarray([cx, cy]))

    if depth is not None:
        # depth is sampled at the RAW (distorted) pixel position
        xi = jnp.clip(jnp.round(raw_uv[:, 0]).astype(jnp.int32), 0, gray.shape[1] - 1)
        yi = jnp.clip(jnp.round(raw_uv[:, 1]).astype(jnp.int32), 0, gray.shape[0] - 1)
        d = depth[yi, xi] * cfg.depth_map_factor
        d = jnp.where((d > 0) & (d < cfg.max_depth) & feat.valid, d, -1.0)
        ur = jnp.where(d > 0, feat.uv[:, 0] - cfg.bf / jnp.maximum(d, 1e-6), -1.0)
        if cfg.lidar_features:
            # selective edge/surf feature cloud (LaserProcessing parity)
            raw_pts, raw_mask, _ = pc.lidar_feature_cloud(
                depth * cfg.depth_map_factor, fx, fy, cx, cy,
                stride=cfg.cloud_stride, max_depth=cfg.max_depth)
        else:
            raw_pts, raw_mask = pc.depth_to_cloud(
                depth * cfg.depth_map_factor, fx, fy, cx, cy,
                stride=cfg.cloud_stride, max_depth=cfg.max_depth)
        cloud, cloud_valid = pc.voxel_downsample(
            raw_pts, raw_mask, cfg.cloud_voxel, cfg.cloud_max_pts)
    else:
        d = jnp.full((n,), -1.0, jnp.float32)
        ur = jnp.full((n,), -1.0, jnp.float32)
        cloud = jnp.zeros((cfg.cloud_max_pts, 3), jnp.float32)
        cloud_valid = jnp.zeros((cfg.cloud_max_pts,), bool)

    if cfg.n_of_slots > 0:
        pad = cfg.n_of_slots
        feat = FeatureSet(
            uv=jnp.concatenate([feat.uv, jnp.zeros((pad, 2))]),
            response=jnp.concatenate([feat.response, jnp.zeros((pad,))]),
            angle=jnp.concatenate([feat.angle, jnp.zeros((pad,))]),
            level=jnp.concatenate([feat.level, jnp.zeros((pad,), jnp.int32)]),
            desc=jnp.concatenate([feat.desc, jnp.zeros((pad, 8), jnp.uint32)]),
            valid=jnp.concatenate([feat.valid, jnp.zeros((pad,), bool)]),
        )
        # OF slots start without depth; the OF stage samples the retained
        # depth image when it fills them (Frame::AddPts parity)
        d = jnp.concatenate([d, jnp.full((pad,), -1.0)])
        ur = jnp.concatenate([ur, jnp.full((pad,), -1.0)])

    pyr = tuple(klt_ops.build_lk_pyramid(img, cfg.lk_levels))
    keep_depth = (depth * cfg.depth_map_factor
                  if (cfg.n_of_slots > 0 and depth is not None) else None)
    return FrameData(feat=feat, depth_kp=d, u_right=ur,
                     cloud=cloud, cloud_valid=cloud_valid, lk_pyramid=pyr,
                     depth_img=keep_depth)
