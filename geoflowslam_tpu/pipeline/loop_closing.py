"""Loop closing: place recognition, Sim3 verification, loop correction.

TPU-native re-expression of the LoopClosing thread
(/root/reference/src/LoopClosing.cc): instead of a polling thread, a
`LoopCloser` invoked by the host after each KF insertion:

* place recognition: BoW query against the KF database
  (NewDetectCommonRegions :353 / KeyFrameDatabase::DetectNBestCandidates)
* geometric verification: descriptor matching between the two KFs'
  map points + Sim3 RANSAC (Sim3Solver) + GN refinement (OptimizeSim3)
* loop correction (CorrectLoop :1022): propagate the corrective Sim3
  through the essential graph — here the full padded pose-graph GN
  (solvers/pose_graph.py) over covisibility + temporal + loop edges,
  with map points re-anchored through their reference KF's correction.
* multi-map merge (MergeLocal :1307/1894): when the candidate lives in a
  dormant Atlas map, the two maps are welded by the Sim3 instead
  (state/map_state.merge_maps) and the pose graph runs on the union.

Global BA after the loop (RunGlobalBundleAdjustment :2360) reuses the
landmark-sharded distributed BA (parallel/dist_ba.py) when a mesh is given,
or the single-device Schur BA otherwise.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from geoflowslam_tpu.math import lie
from geoflowslam_tpu.ops import matching, ransac
from geoflowslam_tpu.retrieval import vocab as V
from geoflowslam_tpu.retrieval import kf_database as DB
from geoflowslam_tpu.solvers import pose_graph as PG
from geoflowslam_tpu.state import map_state as M


from functools import partial


@partial(jax.jit, static_argnames=("max_edges",))
def _extract_essential_edges(ms: M.MapState, cur, cand, s, rot, t,
                             covis_edge_min: float, max_edges: int):
    """Essential-graph edge extraction on device (OptimizeEssentialGraph's
    edge set, /root/reference/src/Optimizer.cc:2042): covisibility edges over
    the threshold + the temporal chain, picked by one masked top-k over the
    [K,K] covisibility matrix; the verified loop edge (i=cand, j=cur,
    measured Sim3) occupies the last slot. Relative-pose measurements come
    from the current (pre-correction) poses, batched."""
    k = ms.k_max
    cov = M.covisibility(ms).astype(jnp.float32)
    valid2 = ms.kf_valid[:, None] & ms.kf_valid[None, :]
    upper = jnp.triu(jnp.ones((k, k), bool), 1)
    w = jnp.where((cov >= covis_edge_min) & upper & valid2,
                  jnp.minimum(cov, 100.0) / 100.0, 0.0)
    # temporal chain: edge (prev[j], j) with the reference's strong weight
    prev = ms.kf_prev
    t_ok = ms.kf_valid & (prev >= 0) & ms.kf_valid[jnp.maximum(prev, 0)]
    w = w.at[jnp.where(t_ok, prev, 0), jnp.arange(k)].max(
        jnp.where(t_ok, 1.0, 0.0))
    vals, flat = jax.lax.top_k(w.reshape(-1), max_edges - 1)
    ei = (flat // k).astype(jnp.int32)
    ej = (flat % k).astype(jnp.int32)
    ev = vals > 0.0
    # measured S_ij = T_i T_j^-1 (unit scale) from current poses
    ri, ti = ms.kf_rot[ei], ms.kf_t[ei]
    rj, tj = ms.kf_rot[ej], ms.kf_t[ej]
    r_rel = jnp.einsum("eab,ecb->eac", ri, rj)          # R_i R_j^T
    t_rel = ti - jnp.einsum("eab,eb->ea", r_rel, tj)
    # loop edge: p_cand_cam = s R p_cur_cam + t => S_cand<-cur = S_ij
    ei = jnp.concatenate([ei, cand[None]])
    ej = jnp.concatenate([ej, cur[None]])
    ew = jnp.concatenate([vals, jnp.array([5.0])])
    ev = jnp.concatenate([ev, jnp.array([True])])
    srel = jnp.concatenate([jnp.ones((max_edges - 1,)), s[None]])
    rrel = jnp.concatenate([r_rel, rot[None]], axis=0)
    trel = jnp.concatenate([t_rel, t[None]], axis=0)
    return PG.PoseGraphEdges(i=ei, j=ej, s=srel, rot=rrel, t=trel,
                             weight=ew, valid=ev)


@partial(jax.jit, static_argnames=("cfg",))
def _count_projection_matches(ms: M.MapState, cur, cand, s, rot, t, cfg):
    """Project the candidate KF's map points into the current KF's camera
    through the verified camera-frame Sim3 (p_cand = s R p_cur + t, so
    p_cur = R^T (p_cand - t) / s) and count descriptor matches near the
    projections (FindMatchesByProjection essence)."""
    obs = ms.kf_obs_mp[cand]
    has = (obs >= 0) & ms.kf_kp_valid[cand]
    mp = jnp.maximum(obs, 0)
    has = has & ms.mp_valid[mp]
    pts_w = ms.mp_pos[mp]
    # candidate-camera coords, then through Sim3^-1 into cur-camera coords
    p_cand = pts_w @ ms.kf_rot[cand].T + ms.kf_t[cand]
    p_cur = (p_cand - t) @ rot / jnp.maximum(s, 1e-9)
    z = jnp.where(jnp.abs(p_cur[:, 2]) < 1e-6, 1e-6, p_cur[:, 2])
    u = cfg.fx * p_cur[:, 0] / z + cfg.cx
    v = cfg.fy * p_cur[:, 1] / z + cfg.cy
    inb = (p_cur[:, 2] > 0.1) & (u >= 0) & (u < 2 * cfg.cx) \
        & (v >= 0) & (v < 2 * cfg.cy)
    uv = jnp.stack([u, v], axis=1)
    radius = jnp.full((obs.shape[0],), 8.0)
    m_idx, m_dist = matching.search_by_projection(
        uv, jnp.zeros_like(obs), has & inb, ms.mp_desc[mp],
        ms.kf_uv[cur], ms.kf_level[cur], ms.kf_desc[cur],
        ms.kf_kp_valid[cur], radius, max_dist=matching.TH_HIGH,
        min_off=0, max_off=8)   # octave-free verification window
    return jnp.sum(m_idx >= 0).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    min_score: float = 0.05
    min_sim3_inliers: int = 20
    fix_scale: bool = True         # stereo/RGBD; mono optimizes scale
    covis_edge_min: int = 30       # essential-graph edge threshold
    max_edges: int = 512
    run_pose_graph: bool = True
    run_global_ba: bool = False    # synchronous GBA right after correction
    # interleaved background GBA (RunGlobalBundleAdjustment as micro-steps
    # driven by SlamSystem, abortable): default on — the reference always
    # spawns its GBA thread after a loop
    async_global_ba: bool = True
    use_icp_loop: bool = False     # UseICPLoop: GICP-refine the loop Sim3
    # temporal consistency: the same candidate region must be re-detected on
    # this many consecutive KFs before geometric verification is attempted
    # (NewDetectCommonRegions' >=3 coincidences, LoopClosing.cc:353-627)
    consistency_needed: int = 3
    # guided-projection verification: minimum matches when projecting the
    # candidate's map points into the current KF through the verified Sim3
    # (FindMatchesByProjection gate, LoopClosing.cc:969)
    min_proj_verify: int = 25
    # post-correction duplicate welding + welding BA (SearchAndFuse :2224,
    # MergeLocal welding BA :1307-1894)
    run_weld: bool = True


class LoopCloser:
    """Host-side loop-closing stage (one call per new KF)."""

    def __init__(self, vocab: V.Vocabulary, k_max: int,
                 cfg: LoopConfig = LoopConfig(), map_cfg=None, mesh=None):
        self.vocab = vocab
        self.cfg = cfg
        self.db = DB.KFDatabase.create(k_max, vocab.n_words)
        self.n_loops = 0
        self.n_merges = 0
        self.key = jax.random.PRNGKey(77)
        if map_cfg is None:
            from geoflowslam_tpu.pipeline.local_mapping import MappingConfig
            map_cfg = MappingConfig()
        self._map_cfg = map_cfg
        self.mesh = mesh  # optional jax.sharding.Mesh: distributed global BA
        # temporal-consistency groups: list of ([K] bool covisibility-group
        # mask, consecutive-detection count) — ORB-SLAM's mvConsistentGroups
        self._consistent_groups: list = []

    def on_keyframe(self, ms: M.MapState, kf_slot: int, inertial: bool = False,
                    kf_clouds: Optional[dict] = None):
        """Detect + correct. Returns (ms, loop_found: bool)."""
        kf_slot_i = int(kf_slot)
        desc = ms.kf_desc[kf_slot_i]
        kp_valid = ms.kf_kp_valid[kf_slot_i]
        words = V.descend(self.vocab, desc, kp_valid)
        qvec = V.bow_vector(self.vocab, words)

        cand_idx, cand_score, cand_ok = DB.detect_candidates(
            self.db, ms, qvec, jnp.int32(kf_slot_i))
        # always register the KF afterwards (reference adds post-detection)
        self.db = self.db._replace(
            bow=self.db.bow.at[kf_slot_i].set(qvec),
            valid=self.db.valid.at[kf_slot_i].set(True))

        best = int(cand_idx[0])
        if not bool(cand_ok[0]) or float(cand_score[0]) < self.cfg.min_score:
            # no candidate this KF: consistency chains are broken
            self._consistent_groups = []
            return ms, False

        # temporal consistency (NewDetectCommonRegions :353): the candidate's
        # covisibility group must have been detected on `consistency_needed`
        # consecutive KFs before we spend geometry on it — a single aliased
        # view never reaches Sim3/correction.
        group = np.array(M.covisibility(ms)[best] > 0)   # writable copy
        group[best] = True
        count = 1
        for g_prev, c_prev in self._consistent_groups:
            if bool(np.any(group & g_prev)):
                count = max(count, c_prev + 1)
        self._consistent_groups = [(group, count)]
        if count < self.cfg.consistency_needed:
            return ms, False

        ok, s, rot, t, n_inl = self._verify_sim3(ms, kf_slot_i, best)
        if not ok:
            return ms, False

        # guided-projection verification (FindMatchesByProjection :969): the
        # verified Sim3 must re-find the candidate's map points when they are
        # projected into the current KF.
        n_proj = int(_count_projection_matches(
            ms, jnp.int32(kf_slot_i), jnp.int32(best), s, rot, t,
            self._map_cfg))
        if n_proj < self.cfg.min_proj_verify:
            return ms, False

        if (self.cfg.use_icp_loop and kf_clouds is not None
                and kf_slot_i in kf_clouds and best in kf_clouds):
            # UseICPLoop: refine the loop transform by registering the two
            # KFs' depth clouds (Tracking/LoopClosing ICP loop verification).
            from geoflowslam_tpu.ops import gicp as G
            c1, v1 = kf_clouds[kf_slot_i]
            c2, v2 = kf_clouds[best]
            reg = G.gicp_register(c1, v1, c2, v2, init_rot=rot, init_t=t)
            if int(reg.n_inliers) >= self.cfg.min_sim3_inliers:
                rot, t = reg.rot, reg.t
                s = jnp.ones(())

        same_map = int(ms.kf_map_id[best]) == int(ms.kf_map_id[kf_slot_i])
        if not same_map:
            # Atlas merge: weld the active map into the candidate's map.
            # The verified Sim3 is camera-frame (p_cand_cam = s R p_cur_cam
            # + t); merge_maps applies a *world*-frame transform, so convert
            # through both KFs' poses:  X' = R2^T(sR R1 X + sR t1 + t - t2)
            # with (R1,t1)=Tcw(cur), (R2,t2)=Tcw(cand)  =>
            # s_w = s, R_w = R2^T R R1, t_w = R2^T(s R t1 + t - t2).
            r1, t1 = ms.kf_rot[kf_slot_i], ms.kf_t[kf_slot_i]
            r2, t2 = ms.kf_rot[best], ms.kf_t[best]
            r_w = r2.T @ rot @ r1
            t_w = r2.T @ (s * (rot @ t1) + t - t2)
            ms = M.merge_maps(ms, ms.kf_map_id[kf_slot_i], ms.kf_map_id[best],
                              s, r_w, t_w)
            self.n_merges += 1
        if self.cfg.run_pose_graph:
            ms = self._correct_loop(ms, kf_slot_i, best, s, rot, t,
                                    yaw_only=inertial)
        if self.cfg.run_weld:
            # SearchAndFuse (:2224): weld duplicate landmarks across the
            # corrected seam (cur <-> cand and cand's strongest covisible),
            # then a welding local BA over the now-connected window
            # (MergeLocal's welding BA essence).
            from geoflowslam_tpu.pipeline import local_mapping as LMod
            cov_b = M.covisibility(ms)[best]
            nb_best = int(jnp.argmax(cov_b))
            ms = LMod.fuse_pair(ms, jnp.int32(kf_slot_i), jnp.int32(best),
                                self._map_cfg)
            if int(cov_b[nb_best]) > 0 and nb_best != kf_slot_i:
                ms = LMod.fuse_pair(ms, jnp.int32(kf_slot_i),
                                    jnp.int32(nb_best), self._map_cfg)
            ms, _ = LMod.local_ba_step(ms, jnp.int32(kf_slot_i),
                                       self._map_cfg)
        if self.cfg.run_global_ba:
            # RunGlobalBundleAdjustment (LoopClosing.cc:2360): full-map BA
            # after the pose-graph correction (synchronous jitted step here
            # instead of a detached thread).
            if self.mesh is not None:
                from geoflowslam_tpu.pipeline.local_mapping import (
                    global_ba_step_distributed)
                ms = global_ba_step_distributed(ms, self._map_cfg, self.mesh)
            else:
                from geoflowslam_tpu.pipeline.local_mapping import global_ba_step
                ms = global_ba_step(ms, self._map_cfg)
        self.n_loops += 1
        self._consistent_groups = []   # fresh chains after a correction
        return ms, True

    # ------------------------------------------------------------------

    def _verify_sim3(self, ms: M.MapState, cur: int, cand: int):
        """Match map points of the two KFs, Sim3 RANSAC + refinement.

        Returns (ok, s, R, t) with (s,R,t) mapping cur-KF camera coords to
        cand-KF camera coords (the relative Sim3 Scm of the reference).
        """
        self.key, k = jax.random.split(self.key)
        m_idx, m_dist = matching.match_descriptors(
            ms.kf_desc[cur], ms.kf_kp_valid[cur] & (ms.kf_obs_mp[cur] >= 0),
            ms.kf_desc[cand], ms.kf_kp_valid[cand] & (ms.kf_obs_mp[cand] >= 0),
            max_dist=matching.TH_LOW, ratio=0.85, mutual=True)

        mp1 = ms.kf_obs_mp[cur]
        mp2 = ms.kf_obs_mp[cand][jnp.maximum(m_idx, 0)]
        valid = (m_idx >= 0) & (mp1 >= 0) & (mp2 >= 0)
        p1w = ms.mp_pos[jnp.maximum(mp1, 0)]
        p2w = ms.mp_pos[jnp.maximum(mp2, 0)]
        # to camera coords of each KF (Sim3Solver works in camera frames)
        p1c = p1w @ ms.kf_rot[cur].T + ms.kf_t[cur]
        p2c = p2w @ ms.kf_rot[cand].T + ms.kf_t[cand]

        res = ransac.ransac_sim3(k, p1c, p2c, valid,
                                 fix_scale=self.cfg.fix_scale, threshold=0.1)
        if int(res.n_inliers) < self.cfg.min_sim3_inliers:
            return False, None, None, None, 0
        s0 = res.model[0]
        r0 = res.model[1:10].reshape(3, 3)
        t0 = res.model[10:13]
        s, rot, t, inl = PG.optimize_sim3_pair(
            s0, r0, t0, p1c, p2c, res.inliers, fix_scale=self.cfg.fix_scale)
        if int(jnp.sum(inl)) < self.cfg.min_sim3_inliers:
            return False, None, None, None, 0
        return True, s, rot, t, int(jnp.sum(inl))

    def _correct_loop(self, ms: M.MapState, cur: int, cand: int, s, rot, t,
                      yaw_only: bool = False):
        """Essential-graph pose-graph optimization with the loop constraint.

        Graph: covisibility edges (weight = shared count, >= covis_edge_min)
        + temporal chain + the loop edge cur->cand with the measured Sim3.
        The loop (candidate-side) KF is held fixed; map points transform with
        their reference KF's correction. Edge extraction is one jitted masked
        top-k over the covisibility matrix (no O(K^2) host loop).
        """
        k_max = ms.k_max
        base_s = jnp.ones((k_max,))
        base_rot, base_t = ms.kf_rot, ms.kf_t
        edges = _extract_essential_edges(
            ms, jnp.int32(cur), jnp.int32(cand), jnp.float32(s), rot, t,
            float(self.cfg.covis_edge_min), self.cfg.max_edges)

        fixed = jnp.zeros((k_max,), bool).at[cand].set(True)
        # inertial maps: 4DoF yaw-only correction (gravity pins roll/pitch,
        # OptimizeEssentialGraph4DoF)
        s_new, r_new, t_new = PG.optimize_pose_graph(
            base_s, base_rot, base_t, ms.kf_valid, fixed, edges,
            fix_scale=self.cfg.fix_scale, iters=10, yaw_only=yaw_only)

        # re-anchor map points through their reference KF correction:
        # X' = S_new^-1 ( S_old (X) ), applied per point via mp_first_kf
        ref_kf = jnp.clip(ms.mp_first_kf, 0, k_max - 1)
        ro, to = base_rot[ref_kf], base_t[ref_kf]
        rn, tn = r_new[ref_kf], t_new[ref_kf]
        sn = s_new[ref_kf]
        # cam coords under old pose
        pc = jnp.einsum("mij,mj->mi", ro, ms.mp_pos) + to
        # back to world with corrected pose: X' = S_new^-1 pc
        rni = jnp.swapaxes(rn, -1, -2)
        pw = jnp.einsum("mij,mj->mi", rni, (pc - tn) / jnp.maximum(sn, 1e-9)[:, None])
        new_pos = jnp.where(ms.mp_valid[:, None], pw, ms.mp_pos)

        # KF poses: Tcw' = s,R,t composed (camera from world scaled)
        return ms._replace(
            kf_rot=jnp.where(ms.kf_valid[:, None, None], r_new, ms.kf_rot),
            kf_t=jnp.where(ms.kf_valid[:, None],
                           t_new / jnp.maximum(s_new, 1e-9)[:, None], ms.kf_t),
            mp_pos=new_pos,
        )
