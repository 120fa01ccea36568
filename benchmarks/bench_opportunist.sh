#!/bin/bash
# Opportunistic live-bench capture: every CYCLE seconds, probe the
# compile service with a tiny salted program (no pause of other jobs);
# if it responds fast (healthy window), run ONE full bench.py (which
# takes the chip exclusively) and stop after a live (non-_recorded)
# result lands.  Keeps the flagship running the rest of the time.
CYCLE=${QSFH_OPP_CYCLE:-2400}
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG="$ROOT/benchmarks/bench_opportunist.log"
cd "$ROOT" || exit 1
while true; do
  ts=$(date -u +%H:%M:%S)
  probe=$(timeout 150 python - <<'EOF' 2>/dev/null
import time, numpy as np
t0 = time.time()
try:
    import jax, jax.numpy as jnp
    salt = float(np.random.default_rng().uniform(1e-30, 2e-30))
    x = jnp.full((256, 256), 1.0 + salt, jnp.float32)
    y = jax.jit(lambda a: (a @ a).sum())(x)
    float(y)
    print(f"ok {time.time()-t0:.1f}")
except Exception as e:
    print(f"fail {type(e).__name__}")
EOF
)
  echo "[$ts] probe: ${probe:-timeout}" >> "$LOG"
  case "$probe" in
    ok\ *)
      t=${probe#ok }
      # healthy = compile+run round trip under 25 s
      if python -c "import sys; sys.exit(0 if float('$t') < 25 else 1)"; then
        echo "[$ts] healthy window -> full bench" >> "$LOG"
        timeout 1100 python bench.py > /tmp/bench_opp.out 2>> "$LOG"
        cat /tmp/bench_opp.out >> "$LOG"
        if grep -q '"metric"' /tmp/bench_opp.out && \
           ! grep -q '_recorded' /tmp/bench_opp.out; then
          # keep looping: a full capture in EVERY healthy window keeps the
          # freshest live number minutes old, not hours (VERDICT r4 next
          # #2b) -- the fused path refreshes benchmarks/tpu_result.json
          # with a worktree-stamped rev on each live run
          echo "[$ts] LIVE result captured; continuing to refresh" >> "$LOG"
        fi
      fi
      ;;
  esac
  sleep "$CYCLE"
done
