#!/usr/bin/env python
"""Assemble results_hard/matrix.{json,md} from completed per-cell runs.

tools/run_hardmode_matrix.py writes the combined matrix only after ALL
cells finish; if a matrix run is interrupted (driver budget, chip
contention), this assembler collects whatever per-cell
results_hard/<tag>/hardmode.json files exist into the same committed
artifacts, so the standing regression gate (tests/test_hardmode_gate.py)
covers every cell that did complete.

    python tools/assemble_hardmode_matrix.py [--out results_hard]
"""
import argparse
import glob
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_hard")
    args = ap.parse_args()
    root = os.path.join(HERE, args.out)

    cells = []
    for jpath in sorted(glob.glob(os.path.join(root, "*", "hardmode.json"))):
        tag = os.path.basename(os.path.dirname(jpath))
        with open(jpath) as f:
            d = json.load(f)
        d["tag"] = tag
        mode = d.get("mode", tag.replace("_loop", ""))
        cmd = (f"tools/../examples/run_hardmode.py --mode {mode} "
               f"--frames {d.get('frames', '?')} --out {args.out}/{tag}")
        if tag.endswith("_loop"):
            cmd += " --loop"
        d.setdefault("cmd", cmd)
        cells.append(d)
    if not cells:
        raise SystemExit(f"no per-cell hardmode.json under {root}")

    lines = [
        "| run (command) | FPS | ATE rmse | RPE trans / rot | "
        "per-KF cost early->late |",
        "|---|---|---|---|---|",
    ]
    for d in cells:
        lines.append(
            f"| `{d['cmd']}` | {d['fps']:.1f} | "
            f"{d['ate_rmse_m']*100:.2f} cm | "
            f"{d['rpe_trans_m']*100:.2f} cm / {d['rpe_rot_deg']:.3f} deg | "
            f"{d['kf_cost_early_ms']:.1f} -> {d['kf_cost_late_ms']:.1f} ms |")
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(root, "matrix.md"), "w") as f:
        f.write(table + "\n")
    with open(os.path.join(root, "matrix.json"), "w") as f:
        json.dump(cells, f, indent=1)
    print(f"\nwrote {root}/matrix.json ({len(cells)} cells)")


if __name__ == "__main__":
    main()
