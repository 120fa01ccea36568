#!/usr/bin/env python
"""Record a judge-reproducible fast-test-profile timing artifact.

VERDICT r4 weak #6: the "6:24 solo" fast-profile claim was builder-
measured only.  This runner times `python -m pytest tests/ -q` (the
default profile deselects slow marks via pytest.ini) on a quiet host and
writes benchmarks/test_profile.json with the pass count, wall time and
timestamp.  Drive it inside the exclusivity guard so the flagship polish
and iQCC jobs are paused:

    python benchmarks/run_exclusive.py python benchmarks/record_test_profile.py
"""
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.normpath(os.path.join(HERE, ".."))
OUT = os.path.join(HERE, "test_profile.json")


def main() -> int:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        cwd=ROOT, capture_output=True, text=True,
        timeout=int(os.environ.get("QSFH_TEST_PROFILE_TIMEOUT", "3600")),
    )
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    m = re.search(r"(\d+) passed", tail)
    rec = {
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git": os.popen(f"git -C {ROOT} rev-parse --short HEAD").read().strip(),
        "cmd": "python -m pytest tests/ -q",
        "rc": proc.returncode,
        "passed": int(m.group(1)) if m else None,
        "summary_line": tail[-200:],
        "wall_s": round(wall, 1),
    }
    with open(OUT + ".tmp", "w") as fh:
        json.dump(rec, fh, indent=1)
    os.replace(OUT + ".tmp", OUT)
    print(json.dumps(rec))
    return 0 if proc.returncode == 0 else proc.returncode


if __name__ == "__main__":
    sys.exit(main())
