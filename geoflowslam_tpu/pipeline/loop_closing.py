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


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    min_score: float = 0.05
    min_sim3_inliers: int = 20
    fix_scale: bool = True         # stereo/RGBD; mono optimizes scale
    covis_edge_min: int = 30       # essential-graph edge threshold
    max_edges: int = 512
    run_pose_graph: bool = True
    run_global_ba: bool = False    # RunGlobalBundleAdjustment after loops
    use_icp_loop: bool = False     # UseICPLoop: GICP-refine the loop Sim3


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
            return ms, False

        ok, s, rot, t, n_inl = self._verify_sim3(ms, kf_slot_i, best)
        if not ok:
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
            # Atlas merge: weld the dormant map into the active one.
            ms = M.merge_maps(ms, ms.kf_map_id[kf_slot_i], ms.kf_map_id[best],
                              s, rot, t)
            self.n_merges += 1
        if self.cfg.run_pose_graph:
            ms = self._correct_loop(ms, kf_slot_i, best, s, rot, t,
                                    yaw_only=inertial)
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
        their reference KF's correction.
        """
        k_max = ms.k_max
        cov = np.asarray(M.covisibility(ms))
        kf_valid = np.asarray(ms.kf_valid)

        edges_i, edges_j, ws = [], [], []
        for i in range(k_max):
            if not kf_valid[i]:
                continue
            for j in range(i + 1, k_max):
                if kf_valid[j] and cov[i, j] >= self.cfg.covis_edge_min:
                    edges_i.append(i); edges_j.append(j); ws.append(float(cov[i, j]))
        prev = np.asarray(ms.kf_prev)
        for i in range(k_max):
            p = prev[i]
            if kf_valid[i] and p >= 0 and kf_valid[p]:
                edges_i.append(int(p)); edges_j.append(i); ws.append(100.0)

        base_rot = ms.kf_rot
        base_t = ms.kf_t
        base_s = jnp.ones((k_max,))

        def rel_sim3(i, j):
            """Measured S_ij = S_i S_j^-1 from current poses."""
            ri, ti = base_rot[i], base_t[i]
            rj, tj = base_rot[j], base_t[j]
            rji, tji = lie.se3_inverse(rj, tj)
            rr, tt = lie.se3_compose(ri, ti, rji, tji)
            return 1.0, rr, tt

        e = self.cfg.max_edges
        n_e = len(edges_i)
        if n_e == 0:
            n_e = 1
            edges_i, edges_j, ws = [cur], [cur], [0.0]
        ei = np.zeros(e, np.int32); ej = np.zeros(e, np.int32)
        ew = np.zeros(e, np.float32); ev = np.zeros(e, bool)
        srel = np.ones(e, np.float32)
        rrel = np.tile(np.eye(3, dtype=np.float32), (e, 1, 1))
        trel = np.zeros((e, 3), np.float32)
        for n in range(min(n_e, e - 1)):
            i, j = edges_i[n], edges_j[n]
            ei[n], ej[n], ew[n], ev[n] = i, j, min(ws[n], 100.0) / 100.0, True
            _, rr, tt = rel_sim3(i, j)
            rrel[n] = np.asarray(rr); trel[n] = np.asarray(tt)
        # loop edge: measured S_cur_cand from the verified Sim3.
        # Sim3 (s,R,t): p_cand_cam = s R p_cur_cam + t => S_cand<-cur; edge
        # (i=cand, j=cur) measures S_ij = S_cand S_cur^-1 = the verified one.
        n = min(n_e, e - 1)
        ei[n], ej[n], ew[n], ev[n] = cand, cur, 5.0, True
        srel[n] = float(s)
        rrel[n] = np.asarray(rot)
        trel[n] = np.asarray(t)

        edges = PG.PoseGraphEdges(
            i=jnp.asarray(ei), j=jnp.asarray(ej), s=jnp.asarray(srel),
            rot=jnp.asarray(rrel), t=jnp.asarray(trel),
            weight=jnp.asarray(ew), valid=jnp.asarray(ev))

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
