#!/bin/bash
# Long-running TPU campaign (round 2): in any healthy service window,
# chain: warm split stages -> measure train step (tpu_result.json) ->
# device profile (tpu_profile.json, if benchmarks/tpu_profile.py exists) ->
# Pallas on-chip validation (tpu_pallas.json, if benchmarks/tpu_pallas.py
# exists).  Cheap novel-program probe each cycle avoids burning 10 minutes
# per sick cycle.  Exits when every artifact exists.
cd /root/repo
LOG=benchmarks/tpu_campaign.log
for i in $(seq 1 400); do
  echo "=== cycle $i $(date +%H:%M:%S) ===" >> $LOG
  # health probe: tiny NOVEL program (salted const) + host fetch, 90 s cap
  if ! timeout 90 python - "$i" >> $LOG 2>&1 <<'EOF'
import sys, time, numpy as np, jax, jax.numpy as jnp
# time-anchored: a restarted campaign's cycle counter would reuse salts
# whose FAILURES the compile service already cached in a sick window
salt = float(sys.argv[1]) * 1e-6 + (time.time() % 86400) * 1e-9
f = jax.jit(lambda x: (x @ x).sum() + salt)
v = float(f(jnp.ones((256, 256), jnp.float32)))
assert np.isfinite(v)
print("probe ok", v)
EOF
  then
    echo "probe FAILED; sleeping" >> $LOG
    sleep 150
    continue
  fi
  if [ ! -f benchmarks/tpu_result.json ]; then
    # time-anchored salt: stays fresh across campaign relaunches (a
    # restarted loop's cycle counter would otherwise reuse salts already
    # sitting in the service's failure cache)
    salt="$(python -c "import time; print(7e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
    ts=$((i % 2))   # alternate merged / two-scan fwd program shapes
    # primary: the WHOLE train step as one fused salted scan program
    # (the program-shape class the chip demonstrably accepts; see
    # benchmarks/tpu_step_fused.py) -- one program, one shot, fast fail
    if [ -f benchmarks/step_fused_expected.json ] && \
        QSFH_BENCH_SALT=$salt QSFH_SPLIT_TWO_SCAN=$ts \
        timeout 560 python benchmarks/tpu_step_fused.py >> $LOG 2>&1; then
      echo "FUSED MEASURE OK salt=$salt two_scan=$ts" >> $LOG
    elif [ $((i % 3)) -eq 0 ]; then
      # occasional fallback: warm the six split stages (now all salted)
      # + dispatch-per-stage measurement
      if QSFH_BENCH_SALT=$salt QSFH_SPLIT_TWO_SCAN=$ts \
          timeout 560 python bench.py --warm-stages >> $LOG 2>&1; then
        echo "WARM OK salt=$salt two_scan=$ts" >> $LOG
        echo "$salt $ts" > benchmarks/tpu_salt.txt
        out=$(QSFH_BENCH_SALT=$salt QSFH_SPLIT_TWO_SCAN=$ts \
          timeout 560 python bench.py --inner 2>>$LOG)
        line=$(echo "$out" | grep '^{' | tail -1)
        if [ -n "$line" ]; then
          echo "$line" > benchmarks/tpu_result.json
          echo "MEASURE OK: $line" >> $LOG
        fi
      else
        echo "warm failed salt=$salt two_scan=$ts" >> $LOG
      fi
    else
      echo "fused failed salt=$salt two_scan=$ts" >> $LOG
    fi
  fi
  if [ -f benchmarks/tpu_profile.py ] && [ ! -f benchmarks/tpu_profile.json ]; then
    timeout 560 python benchmarks/tpu_profile.py >> $LOG 2>&1 \
      && echo "PROFILE OK" >> $LOG
  fi
  if [ -f benchmarks/tpu_pallas.py ] && [ ! -f benchmarks/tpu_pallas.json ]; then
    timeout 560 python benchmarks/tpu_pallas.py >> $LOG 2>&1 \
      && echo "PALLAS OK" >> $LOG
  fi
  if [ -f benchmarks/screen_expected.json ] && [ ! -f benchmarks/tpu_screen.json ]; then
    timeout 560 python benchmarks/tpu_screen.py >> $LOG 2>&1 \
      && echo "SCREEN OK" >> $LOG
  fi
  if [ -f benchmarks/stream_expected.json ] && [ ! -f benchmarks/tpu_stream.json ]; then
    timeout 560 python benchmarks/tpu_stream.py >> $LOG 2>&1 \
      && echo "STREAM OK" >> $LOG
  fi
  # 20-qubit (2x5) fused train step: past the reference's single-device
  # ceiling, streaming kernels on-chip vs XLA CPU trace
  if [ -f benchmarks/step_fused_expected_20q.json ] && \
      [ ! -f benchmarks/tpu_result_20q.json ]; then
    salt20="$(python -c "import time; print(3e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
    QSFH_BENCH_SALT=$salt20 QSFH_FUSED_NX=2 QSFH_FUSED_NY=5 \
      QSFH_FUSED_ANSATZ=6 QSFH_FUSED_K1=1 QSFH_FUSED_K2=3 \
      timeout 560 python benchmarks/tpu_step_fused.py >> $LOG 2>&1 \
      && echo "STEP20 OK" >> $LOG
  fi
  # HVA fused train step (second flagship trainer; reference models/hva.py)
  if [ -f benchmarks/step_hva_expected.json ] && \
      [ ! -f benchmarks/tpu_result_hva.json ]; then
    salth="$(python -c "import time; print(11e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
    QSFH_BENCH_SALT=$salth timeout 560 python benchmarks/tpu_step_hva.py >> $LOG 2>&1 \
      && echo "STEPHVA OK" >> $LOG
  fi
  done_all=1
  [ -f benchmarks/tpu_result.json ] || done_all=0
  [ ! -f benchmarks/tpu_profile.py ] || [ -f benchmarks/tpu_profile.json ] || done_all=0
  [ ! -f benchmarks/tpu_pallas.py ] || [ -f benchmarks/tpu_pallas.json ] || done_all=0
  [ ! -f benchmarks/screen_expected.json ] || [ -f benchmarks/tpu_screen.json ] || done_all=0
  [ ! -f benchmarks/stream_expected.json ] || [ -f benchmarks/tpu_stream.json ] || done_all=0
  [ ! -f benchmarks/step_fused_expected_20q.json ] || [ -f benchmarks/tpu_result_20q.json ] || done_all=0
  [ ! -f benchmarks/step_hva_expected.json ] || [ -f benchmarks/tpu_result_hva.json ] || done_all=0
  if [ "$done_all" = 1 ]; then
    echo "CAMPAIGN COMPLETE $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  sleep 90
done
