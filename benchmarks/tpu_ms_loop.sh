#!/bin/bash
# Opportunistic session loop: record the on-chip batched-multistart
# measurement (benchmarks/tpu_multistart.py -> tpu_multistart.json) in the
# first healthy window of the tunneled compile service.  Same probe +
# time-anchored-salt discipline as tpu_campaign.sh (cycle-indexed salts
# replay cached failures after a restart).
cd /root/repo
LOG=benchmarks/tpu_ms_loop.log
for i in $(seq 1 200); do
  if [ -f benchmarks/tpu_multistart.json ]; then
    echo "MS LOOP COMPLETE $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "=== cycle $i $(date +%H:%M:%S) ===" >> $LOG
  if ! timeout 90 python - "$i" >> $LOG 2>&1 <<'EOF'
import sys, time, numpy as np, jax, jax.numpy as jnp
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
  salt="$(python -c "import time; print(13e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
  if QSFH_BENCH_SALT=$salt timeout 560 python benchmarks/tpu_multistart.py >> $LOG 2>&1; then
    echo "MS MEASURE OK salt=$salt" >> $LOG
  else
    echo "ms failed salt=$salt" >> $LOG
  fi
  sleep 60
done
