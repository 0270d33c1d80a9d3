"""scripts/sustained_from_metrics.py — the in-loop throughput analyzer.

Feeds a synthetic metrics.jsonl shaped like train.py's wandb trail
(train.py:281-289): steady 1 s optimizer steps, an aux-heavy step every
10th (validate+checkpoint cadence), a kill-and-resume overlap region that
re-logs three steps, and a torn final line from the kill. The analyzer
must keep the LAST record per step, drop resume-boundary deltas, and
report quiet-vs-full medians that reconcile with the construction.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCRIPT = os.path.join(HERE, "..", "scripts", "sustained_from_metrics.py")


def _rec(step, tt, aux=0.0):
    return {"_step": step, "misc/training_time": tt,
            "misc/time_loader_s": 0.1, "misc/time_step_s": 0.05,
            "misc/time_log_s": 0.3, "misc/time_aux_s": aux}


def _write_trail(path):
    recs = []
    tt = 0.0
    for s in range(1, 61):
        heavy = s % 10 == 0
        tt += 6.0 if heavy else 1.0
        recs.append(_rec(s, tt, aux=5.0 if heavy else 0.0))
    # kill at step 45: the resumed leg re-logs 43-45 with a training_time
    # that restarted from the step-42 checkpoint's counter (the analyzer
    # must keep these LAST-written records and skip the boundary delta)
    for s in (43, 44, 45):
        recs.append(_rec(s, recs[41]["misc/training_time"] + (s - 42) * 1.0))
    lines = [json.dumps(r) for r in recs]
    lines.append('{"_step": 61, "misc/trainin')  # torn line from the kill
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_analyzer_medians_and_resume_handling(tmp_path):
    path = tmp_path / "metrics.jsonl"
    _write_trail(str(path))
    out = subprocess.run(
        [sys.executable, SCRIPT, str(path), "--batch-patches", "16",
         "--lo", "0"],
        capture_output=True, text=True, check=True)
    r = json.loads(out.stdout)
    assert r["window"] == [1, 60]
    # quiet steps are the 1 s ones; the every-10th 6 s aux steps lift the
    # tail but not the median
    assert r["s_per_step_median_quiet"] == 1.0
    assert r["patches_per_s_quiet"] == 16.0
    assert r["s_per_step_median_full"] == 1.0
    # resume overlap: steps 43-45 were re-logged; dedup keeps one record
    # per step so the delta count stays the consecutive-run count
    assert r["n_steps"] <= 59
    assert r["phase_medians_s"]["time_loader_s"] == 0.1
    assert r["phase_medians_s"]["time_aux_s"] == 0.0


def test_analyzer_run_dir_layout(tmp_path):
    run = tmp_path / "run"
    (run / "wandb").mkdir(parents=True)
    _write_trail(str(run / "wandb" / "metrics.jsonl"))
    out = subprocess.run(
        [sys.executable, SCRIPT, str(run), "--lo", "0"],
        capture_output=True, text=True, check=True)
    assert json.loads(out.stdout)["patches_per_s_quiet"] == 16.0
