#!/usr/bin/env python
"""Convert a run_r3_chip_measurements.sh log into a markdown table.

Usage: python scripts/sweep_to_table.py /tmp/r3_measurements.log
"""

import json
import re
import sys


def main(path: str) -> None:
    rows = []
    cmd = None
    for line in open(path):
        m = re.match(r"^--- (.+) ---$", line.strip())
        if m:
            cmd = m.group(1)
            continue
        if line.startswith("{") and cmd:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows.append((cmd, d))
            cmd = None
    print("| command | metric | value | unit | notes |")
    print("|---|---|---|---|---|")
    for cmd, d in rows:
        notes = []
        if "error" in d:
            notes.append(d["error"])
        if "best" in d:
            notes.append(f"best {d['best']}")
        if "phases" in d:
            top = sorted(d["phases"].items(), key=lambda kv: -kv[1])[:3]
            notes.append(", ".join(f"{k} {v:.2f}s" for k, v in top))
        print(f"| `{cmd.replace('bench.py', '').strip() or '(default)'}` "
              f"| {d.get('metric')} | **{d.get('value')}** | {d.get('unit')} "
              f"| {'; '.join(notes)} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_measurements.log")
