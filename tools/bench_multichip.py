#!/usr/bin/env python
"""Distributed-BA scaling record across virtual device meshes.

Runs the production-shape GBA problem (256 KFs x 4096 landmarks, the
AsyncGBA operating point) through `parallel/dist_ba.make_distributed_ba`
on 1/2/4/8-device meshes and reports per-iteration wall time plus the
cross-device agreement of the optimized state.

NOTE on interpretation: this host exposes ONE physical CPU core; the
virtual-device meshes validate the SPMD program (sharding layout,
collective schedule, numerics) — wall-clock on them measures the
partitioning overhead, NOT real scaling. On a real v5e pod slice the
per-shard work (Hll, partial reduced system) divides by the mesh size and
the single psum of the [6K, 6K] reduced system rides ICI; the measured
numbers to watch there are bytes-per-iteration (fixed: 6K*6K*4 + 6K*4) vs
per-shard FLOPs (linear in M/D).

Usage: python tools/bench_multichip.py [--kfs 256] [--pts 4096] [--iters 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kfs", type=int, default=256)
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--meshes", default="1,2,4,8")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    n_max = max(int(x) for x in args.meshes.split(","))
    xf = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xf:
        os.environ["XLA_FLAGS"] = (
            xf + f" --xla_force_host_platform_device_count={n_max}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh
    from geoflowslam_tpu.parallel import dist_ba
    from geoflowslam_tpu.pipeline import local_mapping as LM
    import __graft_entry__ as G

    ms, pts_gt = G._populated_production_map(
        k_used=args.kfs, n_pts=args.pts, k_max=args.kfs)
    results = []
    ref_t = None
    for n in [int(x) for x in args.meshes.split(",")]:
        devs = jax.devices()[:n]
        mesh = Mesh(np.array(devs), axis_names=("land",))
        t0 = time.time()
        out = LM.global_ba_step_distributed(ms, LM.MappingConfig(), mesh,
                                            ba_pts=args.pts, iters=args.iters)
        jax.block_until_ready(out.kf_t)
        cold = time.time() - t0
        t0 = time.time()
        out = LM.global_ba_step_distributed(ms, LM.MappingConfig(), mesh,
                                            ba_pts=args.pts, iters=args.iters)
        jax.block_until_ready(out.kf_t)
        warm = time.time() - t0
        kt = np.asarray(out.kf_t)
        agree = (float(np.max(np.abs(kt - ref_t))) if ref_t is not None
                 else 0.0)
        if ref_t is None:
            ref_t = kt
        err = np.linalg.norm(np.asarray(out.mp_pos[:args.pts]) - pts_gt,
                             axis=1)
        row = {"devices": n, "cold_s": round(cold, 2),
               "warm_s": round(warm, 2),
               "warm_s_per_iter": round(warm / args.iters, 3),
               "max_abs_diff_vs_1dev": agree,
               "median_pt_err_m": round(float(np.median(err)), 5)}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"shape": {"kfs": args.kfs, "pts": args.pts,
                                "iters": args.iters}, "rows": results}))


if __name__ == "__main__":
    main()
