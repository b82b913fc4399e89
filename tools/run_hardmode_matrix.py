#!/usr/bin/env python
"""Run the standing hard-mode parity matrix and emit the PARITY.md table.

VERDICT round-2 item #4: in lieu of TUM/EuRoC data (none exists in this
environment), the committed substitute is the hard synthetic sequence
(epoch stamps, 40 s loop revisits, rotation bursts, texture-poor segments)
run for every primary mode, each with loop closing off and on, on the real
TPU chip. Mirrors the role of the reference evaluator
(/root/reference/script/evaluator/ours/PoseEvaluatorTUM.py:16-53).

    python tools/run_hardmode_matrix.py [--frames 2000] [--out results_hard]

Each cell invokes examples/run_hardmode.py as a subprocess (fresh process =
fresh TPU client; runs serialize on the single chip) and collects its
hardmode.json. Prints the markdown table and writes results_hard/matrix.md.
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--out", default="results_hard")
    ap.add_argument("--modes", default="rgbd,rgbd_inertial,mono")
    ap.add_argument("--robust", action="store_true",
                    help="add an rgbd cell with the GeoFlow robustness "
                         "switches on (--of --icp; non-fused path)")
    args = ap.parse_args()

    variants = [(m, loop, False) for m in args.modes.split(",")
                for loop in (False, True)]
    if args.robust:
        variants.append(("rgbd", False, True))

    cells = []
    for mode, loop, robust in variants:
        for _ in (0,):
            tag = f"{mode}{'_loop' if loop else ''}{'_of_icp' if robust else ''}"
            out = os.path.join(args.out, tag)
            cmd = [sys.executable, os.path.join(HERE, "examples",
                                                "run_hardmode.py"),
                   "--mode", mode, "--frames", str(args.frames),
                   "--out", out]
            if loop:
                cmd.append("--loop")
            if robust:
                cmd += ["--of", "--icp"]
            print(f"== {tag}: {' '.join(cmd)}", flush=True)
            r = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True)
            sys.stdout.write(r.stdout[-2000:])
            sys.stderr.write(r.stderr[-2000:])
            jpath = os.path.join(HERE, out, "hardmode.json")
            if r.returncode != 0 or not os.path.exists(jpath):
                cells.append({"tag": tag, "cmd": " ".join(cmd),
                              "error": r.returncode})
                continue
            with open(jpath) as f:
                d = json.load(f)
            d["tag"] = tag
            d["cmd"] = " ".join(c for c in cmd if c != sys.executable)
            cells.append(d)

    lines = [
        "| run (command) | FPS | ATE rmse | RPE trans / rot | "
        "per-KF cost early->late |",
        "|---|---|---|---|---|",
    ]
    for d in cells:
        if "error" in d:
            lines.append(f"| `{d['cmd']}` | FAILED rc={d['error']} | | | |")
            continue
        lines.append(
            f"| `{d['cmd']}` | {d['fps']:.1f} | "
            f"{d['ate_rmse_m']*100:.2f} cm | "
            f"{d['rpe_trans_m']*100:.2f} cm / {d['rpe_rot_deg']:.3f} deg | "
            f"{d['kf_cost_early_ms']:.1f} -> {d['kf_cost_late_ms']:.1f} ms |")
    table = "\n".join(lines)
    print(table)
    os.makedirs(os.path.join(HERE, args.out), exist_ok=True)
    with open(os.path.join(HERE, args.out, "matrix.md"), "w") as f:
        f.write(table + "\n")
    with open(os.path.join(HERE, args.out, "matrix.json"), "w") as f:
        json.dump(cells, f, indent=1)


if __name__ == "__main__":
    main()
