#!/usr/bin/env python
"""Run a command in a chip-exclusive window.

Reuses bench.py's _chip_exclusive guard: SIGSTOPs the known long-running
repo chip/CPU jobs (flagship growth loop, iQCC campaign) for the duration
of the child command, drains already-submitted programs off the chip, and
ALWAYS resumes them on exit (including on ctrl-C / timeout of the child).

    python benchmarks/run_exclusive.py env QSFH_STREAM_BIG_N=28 \
        python benchmarks/tpu_stream_big.py
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import bench  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: run_exclusive.py CMD [ARGS...]", file=sys.stderr)
        return 2
    with bench._chip_exclusive():
        try:
            return subprocess.call(sys.argv[1:])
        except KeyboardInterrupt:
            return 130


if __name__ == "__main__":
    sys.exit(main())
