"""Regression gate over the committed hard-mode parity matrix.

VERDICT round-2 item #4: the hard-mode matrix (tools/run_hardmode_matrix.py,
real TPU) is the standing substitute for TUM/EuRoC parity runs
(/root/reference/script/evaluator/ours/PoseEvaluatorTUM.py role). This test
gates the most recent committed results in results_hard/matrix.json so a
regression in any mode's accuracy or mapping-cost flatness fails the suite.

Skips when no matrix has been produced on this host (the matrix needs the
real chip; unit CI runs on the CPU mesh).
"""
import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MATRIX = os.path.join(HERE, "results_hard", "matrix.json")

# per-mode ATE gates (meters). Mono is Sim3-aligned (scale-free); inertial
# modes must hold metric scale. Loop-on runs must beat or match loop-off.
ATE_GATE = {
    "rgbd": 0.40, "rgbd_loop": 0.10,
    "rgbd_inertial": 0.40, "rgbd_inertial_loop": 0.10,
    "mono": 0.40, "mono_loop": 0.15,
}
RPE_GATE_M = 0.05          # local drift, all modes
FPS_GATE = {"rgbd": 30.0}  # primary modes must sustain sensor rate


@pytest.mark.skipif(not os.path.exists(MATRIX),
                    reason="no hard-mode matrix on this host (needs TPU)")
def test_hardmode_matrix_gates():
    with open(MATRIX) as f:
        cells = {d["tag"]: d for d in json.load(f)}
    assert cells, "matrix.json is empty"
    for tag, d in cells.items():
        assert "error" not in d, f"{tag} failed: {d}"
        gate = ATE_GATE.get(tag)
        if gate is not None:
            assert d["ate_rmse_m"] < gate, (tag, d["ate_rmse_m"], gate)
        assert d["rpe_trans_m"] < RPE_GATE_M, (tag, d["rpe_trans_m"])
        # per-KF mapping cost must stay flat as the map grows (no O(K))
        if d["kf_cost_early_ms"] == d["kf_cost_early_ms"]:  # not NaN
            assert d["kf_cost_late_ms"] < 4.0 * d["kf_cost_early_ms"] + 50, (
                tag, d["kf_cost_early_ms"], d["kf_cost_late_ms"])
    for mode, fps in FPS_GATE.items():
        if mode in cells:
            assert cells[mode]["fps"] >= fps, (mode, cells[mode]["fps"])
