"""Profile the per-KF mapping megastep and its sub-stages on the real chip.

Round-3 verdict weak #2: per-KF mapping cost grew 724 -> 1567 ms over 55 KFs
at k=128/m=32k, and the production-scale bench (k=256/m=65536) shows ~5-10 s
of device time per KF event. This tool times each sub-stage of
`local_mapping.mapping_step` at a configurable map shape/occupancy so the
O(K*M) / scatter-bound term can be identified and fixed.

Usage:  python tools/profile_mapping.py [--k 256] [--m 65536] [--kfs 30]
        [--mps 1500] [--reps 5]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/root/.cache/jax_bench_cache", exist_ok=True)


def sync(x):
    """Genuine device sync: read one element (block_until_ready is a no-op
    on the axon tunnel)."""
    leaf = None
    import jax
    for l in jax.tree_util.tree_leaves(x):
        leaf = l
        break
    _ = np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(name, fn, reps):
    out = fn()          # compile
    sync(out)
    t0 = time.perf_counter()
    c0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"  {name:34s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--kfs", type=int, default=30)
    ap.add_argument("--mps", type=int, default=1500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from geoflowslam_tpu.state import map_state as M
    from geoflowslam_tpu.pipeline import local_mapping as LM
    from geoflowslam_tpu.pipeline import tracking as T

    print(f"device: {jax.devices()[0]}, shape k={args.k} m={args.m} "
          f"n={args.n}, occupancy {args.kfs} KFs / {args.mps} MPs",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    ms = M.create(k_max=args.k, n_kp=args.n, m_max=args.m)
    K, N, Mm = args.k, args.n, args.m
    nk, nm = args.kfs, args.mps

    kf_valid = np.zeros((K,), bool); kf_valid[:nk] = True
    mp_valid = np.zeros((Mm,), bool); mp_valid[:nm] = True
    # each KF observes ~60% of its kps, bound to random live MPs
    obs = np.full((K, N), -1, np.int32)
    kpv = np.zeros((K, N), bool)
    for k in range(nk):
        sel = rng.random(N) < 0.6
        obs[k, sel] = rng.integers(0, nm, sel.sum())
        kpv[k] = True
    ms = ms._replace(
        kf_valid=jnp.asarray(kf_valid),
        kf_map_id=jnp.where(jnp.asarray(kf_valid), 0, -1),
        kf_prev=jnp.asarray(np.concatenate([[-1], np.arange(K - 1)])
                            .astype(np.int32)),
        kf_time=jnp.asarray(np.arange(K) * 0.5, jnp.float32),
        kf_uv=jnp.asarray(rng.uniform(0, 640, (K, N, 2)), jnp.float32),
        kf_level=jnp.asarray(rng.integers(0, 8, (K, N)), jnp.int32),
        kf_desc=jnp.asarray(rng.integers(0, 2**32, (K, N, 8), np.uint32,
                                         endpoint=False)),
        kf_depth=jnp.asarray(rng.uniform(0.5, 5.0, (K, N)), jnp.float32),
        kf_kp_valid=jnp.asarray(kpv),
        kf_obs_mp=jnp.asarray(obs),
        mp_pos=jnp.asarray(rng.normal(0, 2, (Mm, 3)), jnp.float32),
        mp_valid=jnp.asarray(mp_valid),
        mp_desc=jnp.asarray(rng.integers(0, 2**32, (Mm, 8), np.uint32,
                                         endpoint=False)),
        mp_map_id=jnp.where(jnp.asarray(mp_valid), 0, -1),
        mp_found=jnp.asarray(np.full(Mm, 3.0), jnp.float32),
        mp_visible=jnp.asarray(np.full(Mm, 4.0), jnp.float32),
        mp_first_kf=jnp.asarray(rng.integers(0, nk, Mm), jnp.int32),
        mp_birth_seq=jnp.zeros((Mm,), jnp.int32),
        kf_counter=jnp.asarray(nk, jnp.int32),
    )
    center = jnp.asarray(nk - 1, jnp.int32)
    cfg = LM.MappingConfig()

    reps = args.reps
    print("sub-stages:")
    inc_f = jax.jit(M.observation_incidence)
    timeit("observation_incidence [K,M]", lambda: inc_f(ms), reps)
    cov_f = jax.jit(M.covisibility)
    timeit("covisibility [K,K]", lambda: cov_f(ms), reps)
    lw_f = jax.jit(lambda ms, c: M.local_window(ms, c, 10, 2048))
    timeit("local_window", lambda: lw_f(ms, center), reps)
    cull_f = jax.jit(M.cull_map_points)
    timeit("cull_map_points", lambda: cull_f(ms), reps)
    timeit("fuse_duplicates (5 nb)",
           lambda: LM.fuse_duplicates(ms, center, cfg), reps)
    timeit("refresh_point_stats",
           lambda: LM.refresh_point_stats(ms, center), reps)
    timeit("keyframe_culling",
           lambda: LM.keyframe_culling(ms, center), reps)
    timeit("local_ba_step (extract+GN+wb)",
           lambda: LM.local_ba_step(ms, center, cfg), reps)

    # full visual mapping_step (use_vi=False to avoid fabricating IMU segs)
    tcfg = T.TrackConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0, bf=40.0)
    kw = 8
    from geoflowslam_tpu.state.frame import FrameData
    from geoflowslam_tpu.ops.extractor import FeatureSet
    feat = FeatureSet(uv=ms.kf_uv[center], response=jnp.ones((N,)),
                      angle=ms.kf_angle[center], level=ms.kf_level[center],
                      desc=ms.kf_desc[center], valid=ms.kf_kp_valid[center])
    d_kp = ms.kf_depth[center]
    fd = FrameData(feat=feat, depth_kp=d_kp,
                   u_right=jnp.where(d_kp > 0,
                                     ms.kf_uv[center][:, 0] - 40.0 / d_kp,
                                     -1.0),
                   cloud=jnp.zeros((4096, 3)),
                   cloud_valid=jnp.zeros((4096,), bool),
                   lk_pyramid=(jnp.zeros((480, 640)),))
    slots_p = jnp.asarray(np.arange(max(nk - kw, 0), max(nk - kw, 0) + kw,
                                    dtype=np.int32))
    sv = jnp.asarray(np.ones(kw, bool))
    try:
        timeit("mapping_step (visual, ONE dispatch)",
               lambda: LM.mapping_step(
                   ms, fd, ms.kf_rot[center], ms.kf_t[center],
                   jnp.float32(10.0), ms.kf_obs_mp[center], center,
                   jnp.asarray(nk, jnp.int32), jnp.zeros(3), jnp.zeros(6),
                   slots_p, sv, None, None, None, None, None,
                   tcfg, cfg, kw, False), reps)
    except Exception as e:
        print(f"  (mapping_step direct call failed: {e})")

    # ---- the VI megastep — the variant bench.py actually runs per KF
    # (round-4 VERDICT weak #3: the visual-only profile missed the path
    # that was slow). Real preintegrated segments (200 Hz gravity-noise
    # samples through InertialTracker.on_keyframe, exactly the bench's
    # machinery) + EdgeICP RelPoseFactors + the per-KF loop-detect
    # dispatch, at the same map shape/occupancy. --------------------------
    from geoflowslam_tpu.pipeline.inertial import ImuConfig, InertialTracker
    from geoflowslam_tpu.solvers.inertial_ba import RelPoseFactors

    imu = InertialTracker(ImuConfig())
    n_s = 100      # 0.5 s KF gap at 200 Hz
    for slot in range(nk):
        acc = rng.normal(0, 0.05, (n_s, 3)).astype(np.float32)
        acc[:, 2] += 9.81   # gravity-aligned stationary-ish segment
        gyr = rng.normal(0, 0.01, (n_s, 3)).astype(np.float32)
        dts = np.full((n_s,), 1.0 / 200.0, np.float32)
        imu._chunks = [(acc, gyr, dts, None)]
        imu.on_keyframe(slot)
    segs = imu.build_segments([int(s) for s in np.asarray(slots_p)])
    walk = np.asarray(imu.walk_info, np.float32)
    icp = RelPoseFactors(
        rot=jnp.broadcast_to(jnp.eye(3), (kw - 1, 3, 3)),
        t=jnp.zeros((kw - 1, 3)),
        info=jnp.full((kw - 1,), 1e2, jnp.float32))
    try:
        timeit("mapping_step (VI+EdgeICP, kw=8)",
               lambda: LM.mapping_step(
                   ms, fd, ms.kf_rot[center], ms.kf_t[center],
                   jnp.float32(10.0), ms.kf_obs_mp[center], center,
                   jnp.asarray(nk, jnp.int32), jnp.zeros(3), jnp.zeros(6),
                   slots_p, sv, segs, imu.r_cb, imu.t_cb, walk, icp,
                   tcfg, cfg, kw, True), reps)
    except Exception as e:
        print(f"  (VI mapping_step failed: {e})")

    # per-KF place-recognition dispatch (LoopCloser.begin_detect — in the
    # bench's measured loop since loop closing is ON)
    try:
        from geoflowslam_tpu.pipeline.loop_closing import LoopCloser
        from geoflowslam_tpu.retrieval.vocab import default_vocabulary
        lc = LoopCloser(default_vocabulary(), K)
        timeit("loop detect_step (per-KF dispatch)",
               lambda: lc.begin_detect(ms, int(center)), reps)
    except Exception as e:
        print(f"  (loop detect_step failed: {e})")


if __name__ == "__main__":
    main()
