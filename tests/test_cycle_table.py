"""scripts/flagship_cycle_table.py — per-LR-cycle run digests.

Synthesizes a 2.5-cycle metrics.jsonl (train records + separate val/
records at the validate_every cadence, as train.py:281-305 emits them)
and checks cycle bucketing, per-step record merging, and the checkpoint
inventory line.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCRIPT = os.path.join(HERE, "..", "scripts", "flagship_cycle_table.py")


def test_cycle_table(tmp_path):
    run = tmp_path / "run"
    (run / "wandb").mkdir(parents=True)
    (run / "check_points").mkdir()
    with open(run / "wandb" / "metrics.jsonl", "w") as f:
        for s in range(1, 2501):
            cyc = (s - 1) // 1000
            tri = 1 - abs((s % 1000) - 500) / 500
            f.write(json.dumps({
                "_step": s, "lr": 1e-4 + 4e-4 * tri * 0.5 ** cyc,
                "train/loss_l1": 2.0 + 1.0 / s,
                "misc/training_time": 0.7 * s,
                "misc/host_rss_bytes": 6 << 30}) + "\n")
            if s % 100 == 0:  # val/ metrics land in their own record
                f.write(json.dumps(
                    {"_step": s, "val/loss_l1": 3.0 / s}) + "\n")
    for n in (100, 2500):
        (run / "check_points" / f"model_{n}.ckpt").touch()
    (run / "check_points" / "model_best.ckpt").touch()

    out = subprocess.run(
        [sys.executable, SCRIPT, str(run)],
        capture_output=True, text=True, check=True).stdout
    rows = [l for l in out.splitlines() if l.startswith("| ") and "cycle" not in l]
    assert len(rows) == 3  # 1-1000, 1001-2000, 2001-2500
    # triangular2 peak halves each cycle: 5e-4, 3e-4, 2e-4
    assert "5.00e-04" in rows[0] and "3.00e-04" in rows[1] and "2.00e-04" in rows[2]
    # val record merged into the train step's record, best val is the latest
    assert "(@1000)" in rows[0] and "(@2500)" in rows[2]
    assert "checkpoints on disk: 3 (first 100, last 2500, best: yes)" in out
    assert "best val L1 overall: 0.0012 @ iteration 2500" in out
