#!/bin/bash
# Round-3 on-chip measurement campaign.  Run while the flagship
# continuation is PAUSED (both contend for the tunneled compile service;
# round-3 lesson: serialize all TPU work).  Resumable: every leg skips
# itself when its artifact already exists, so a sick window costs one
# cycle, not the campaign.  Same probe + time-anchored-salt discipline
# as tpu_campaign.sh.
#
#   bash benchmarks/tpu_campaign_r3.sh >> benchmarks/tpu_campaign_r3.log 2>&1 &
#
# Legs (VERDICT round-2 items in parens):
#   1. bench.py live                      (#2)  -> /tmp/bench_r3.json
#   2. double-float on-chip check         (#4)  -> tpu_df_check.json
#   3. 26q streaming A/B static vs dyn    (#3)  -> tpu_stream_big_26{,_dyn}.json
#   4. 24q stream + XLA cross-check       (#10) -> tpu_stream_24.json
#   5. 22q fused train step               (#5)  -> tpu_result_22q.json
#   6. 24q fused train step               (#5)  -> tpu_result_24q.json
#   7. batched multistart                 (r3 parity-gate fix) -> tpu_multistart.json
#   8. 28q/30q streaming rerun (static)   (#3)  -> tpu_stream_big_{28,30}.json

cd /root/repo
LOG_PREFIX="[r3]"

probe() {
  timeout 90 python - "$1" <<'EOF'
import sys, time, numpy as np, jax, jax.numpy as jnp
salt = float(sys.argv[1]) * 1e-6 + (time.time() % 86400) * 1e-9
f = jax.jit(lambda x: (x @ x).sum() + salt)
v = float(f(jnp.ones((256, 256), jnp.float32)))
assert np.isfinite(v)
print("probe ok", v)
EOF
}

leg() {  # leg <artifact> <timeout> <cmd...>
  local artifact="$1" tmo="$2"; shift 2
  if [ -f "$artifact" ]; then
    echo "$LOG_PREFIX skip (exists): $artifact"
    return 0
  fi
  echo "$LOG_PREFIX leg -> $artifact : $* ($(date +%H:%M:%S))"
  local salt
  salt="$(python -c 'import time; print((time.time() % 86400) * 1e-9)')"
  if QSFH_BENCH_SALT=$salt timeout "$tmo" "$@"; then
    echo "$LOG_PREFIX leg OK: $artifact"
  else
    echo "$LOG_PREFIX leg FAILED: $artifact (continuing)"
  fi
  sleep 30
}

for i in $(seq 1 60); do
  echo "$LOG_PREFIX === cycle $i $(date +%H:%M:%S) ==="
  if ! probe "$i"; then
    echo "$LOG_PREFIX probe failed; sleeping"
    sleep 150
    continue
  fi

  # 1. live bench (writes its JSON line to stdout; capture it)
  if [ ! -f /tmp/bench_r3.json ]; then
    echo "$LOG_PREFIX leg -> bench live ($(date +%H:%M:%S))"
    if timeout 1100 python bench.py > /tmp/bench_r3_out.txt 2>>/tmp/bench_r3_err.txt; then
      grep -m1 '^{' /tmp/bench_r3_out.txt > /tmp/bench_r3.json || true
      echo "$LOG_PREFIX bench: $(cat /tmp/bench_r3.json)"
    else
      echo "$LOG_PREFIX bench run failed/timed out"
    fi
    sleep 30
  fi

  leg benchmarks/tpu_df_check.json          600 python benchmarks/tpu_df_check.py
  leg benchmarks/tpu_stream_big_26.json     900 env QSFH_STREAM_BIG_N=26 python benchmarks/tpu_stream_big.py
  leg benchmarks/tpu_stream_big_26_dyn.json 900 env QSFH_STREAM_BIG_N=26 QSFH_STREAM_STATIC=0 python benchmarks/tpu_stream_big.py
  leg benchmarks/tpu_stream_24.json         900 env QSFH_STREAM_N=24 python benchmarks/tpu_stream.py
  # stages dispatch: the K-unrolled form's streaming-adjoint program is a
  # 34 MB MLIR payload at 22q that kills the compile helper (HTTP 500)
  leg benchmarks/tpu_result_22q.json        900 env QSFH_FUSED_DISPATCH=stages QSFH_FUSED_NX=1 QSFH_FUSED_NY=11 QSFH_FUSED_ANSATZ=6 QSFH_FUSED_K1=1 QSFH_FUSED_K2=3 python benchmarks/tpu_step_fused.py
  leg benchmarks/tpu_result_24q.json        900 env QSFH_FUSED_DISPATCH=stages QSFH_FUSED_NX=2 QSFH_FUSED_NY=6 QSFH_FUSED_ANSATZ=6 QSFH_FUSED_K1=1 QSFH_FUSED_K2=3 python benchmarks/tpu_step_fused.py
  leg benchmarks/tpu_multistart.json        600 python benchmarks/tpu_multistart.py
  leg benchmarks/tpu_adjoint18.json         900 python benchmarks/tpu_adjoint18.py
  leg benchmarks/tpu_stream_big_28.json     1200 env QSFH_STREAM_BIG_N=28 python benchmarks/tpu_stream_big.py
  leg benchmarks/tpu_stream_big_30.json     1800 env QSFH_STREAM_BIG_N=30 python benchmarks/tpu_stream_big.py

  # all artifacts present?
  missing=0
  for a in /tmp/bench_r3.json benchmarks/tpu_df_check.json \
           benchmarks/tpu_stream_big_26.json benchmarks/tpu_stream_big_26_dyn.json \
           benchmarks/tpu_stream_24.json benchmarks/tpu_result_22q.json \
           benchmarks/tpu_result_24q.json benchmarks/tpu_multistart.json \
           benchmarks/tpu_adjoint18.json \
           benchmarks/tpu_stream_big_28.json benchmarks/tpu_stream_big_30.json; do
    [ -f "$a" ] || missing=$((missing + 1))
  done
  if [ "$missing" -eq 0 ]; then
    echo "$LOG_PREFIX CAMPAIGN COMPLETE $(date +%H:%M:%S)"
    exit 0
  fi
  echo "$LOG_PREFIX cycle done, $missing artifacts missing; sleeping"
  sleep 120
done
echo "$LOG_PREFIX campaign exhausted cycles"
