"""Warm the persistent compilation cache for bench.py's TPU programs.

Run standalone (loops with backoff until one full success); after that,
bench.py --inner serves every executable from the local cache and is
independent of the remote compile service's health.
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "..", "bench.py")

attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 12
wait_s = int(sys.argv[2]) if len(sys.argv) > 2 else 240

for k in range(attempts):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, BENCH, "--inner"],
        capture_output=True,
        text=True,
        timeout=560,
    )
    took = time.time() - t0
    if proc.returncode == 0 and "{" in proc.stdout:
        print(f"attempt {k}: SUCCESS in {took:.0f}s -> cache warm")
        print(proc.stdout.strip().splitlines()[-1])
        sys.exit(0)
    print(f"attempt {k}: failed ({took:.0f}s); sleeping {wait_s}s", flush=True)
    time.sleep(wait_s)
print("cache never warmed")
sys.exit(1)
