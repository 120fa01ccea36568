#!/bin/bash
# Round-5 chip campaign: run the remaining VERDICT legs whenever the
# compile service is healthy, one pass per cycle, marking completed legs
# in campaign_r5_state.json.  Crash-risky legs (30q fused-static) run
# LAST in a pass so a worker fault cannot eat the others.
#
# Legs:
#   adjprobe  -- tpu_adj_chain_probe.py (regression/recovery record; every pass)
#   stepab    -- demo_3x3/step_chain_ab.py (flagship-scale step A/B; once)
#   screen24  -- tpu_screen_24.py re-record post chunk-split fix (once)
#   stream30  -- 30q fused-static with 128/64-row blocks (once, crash-tolerant)
CYCLE=${QSFH_R5_CYCLE:-1800}
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG="$ROOT/benchmarks/campaign_r5.log"
STATE="$ROOT/benchmarks/campaign_r5_state.json"
cd "$ROOT" || exit 1

has() { python - "$1" <<'EOF'
import json, os, sys
p = os.path.join("benchmarks", "campaign_r5_state.json")
d = json.load(open(p)) if os.path.exists(p) else {}
sys.exit(0 if d.get(sys.argv[1]) else 1)
EOF
}
mark() { python - "$1" <<'EOF'
import json, os, sys, time
p = os.path.join("benchmarks", "campaign_r5_state.json")
d = json.load(open(p)) if os.path.exists(p) else {}
d[sys.argv[1]] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
json.dump(d, open(p, "w"), indent=1)
EOF
}

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
      if python -c "import sys; sys.exit(0 if float('$t') < 25 else 1)"; then
        echo "[$ts] healthy; running pass" >> "$LOG"
        # live-bench refresh first (the opportunist loop is folded in here
        # while campaign legs remain, so two loops never contend mid-leg)
        timeout 1100 python bench.py > /tmp/bench_r5.out 2>> "$LOG"
        cat /tmp/bench_r5.out >> "$LOG"
        if grep -q '"metric"' /tmp/bench_r5.out && \
           ! grep -q '_recorded' /tmp/bench_r5.out; then
          echo "[$ts] LIVE bench captured" >> "$LOG"
        fi
        timeout 300 python benchmarks/tpu_adj_chain_probe.py >> "$LOG" 2>&1

        if ! has stepab; then
          echo "[$ts] leg stepab" >> "$LOG"
          timeout 3000 python benchmarks/demo_3x3/step_chain_ab.py >> "$LOG" 2>&1 \
            && grep -q '"best_route"' benchmarks/demo_3x3/step_chain_ab.json \
            && mark stepab
        fi

        if ! has screen24; then
          echo "[$ts] leg screen24" >> "$LOG"
          timeout 3000 python benchmarks/run_exclusive.py \
            python benchmarks/tpu_screen_24.py >> "$LOG" 2>&1 \
            && mark screen24
        fi

        if ! has stream30; then
          echo "[$ts] leg stream30 (rows=128)" >> "$LOG"
          if timeout 2400 env QSFH_STREAM_BIG_N=30 QSFH_STREAM_FUSED_STATIC=1 \
              QSFH_PALLAS_STREAM_ROWS=128 \
              python benchmarks/run_exclusive.py \
              python benchmarks/tpu_stream_big.py >> "$LOG" 2>&1; then
            mark stream30
          else
            echo "[$ts] rows=128 failed; waiting for worker recovery" >> "$LOG"
            sleep 240
            echo "[$ts] leg stream30 (rows=64)" >> "$LOG"
            if timeout 2400 env QSFH_STREAM_BIG_N=30 QSFH_STREAM_FUSED_STATIC=1 \
                QSFH_PALLAS_STREAM_ROWS=64 \
                python benchmarks/run_exclusive.py \
                python benchmarks/tpu_stream_big.py >> "$LOG" 2>&1; then
              mark stream30
            else
              mark stream30_failed
              mark stream30
              echo "[$ts] 30q fused-static crashes at 128- and 64-row blocks too" >> "$LOG"
              sleep 240
            fi
          fi
        fi

        if has stepab && has screen24 && has stream30; then
          echo "[$ts] all legs done; handing back to the opportunist loop" >> "$LOG"
          setsid nohup bash benchmarks/bench_opportunist.sh >/dev/null 2>&1 &
          echo $! > /tmp/bench_opp.pid
          exit 0
        fi
      fi
      ;;
  esac
  sleep "$CYCLE"
done
