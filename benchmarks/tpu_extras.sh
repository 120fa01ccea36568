#!/bin/bash
# Secondary healthy-window consumer: artifacts beyond the main campaign.
#   - 24-qubit streaming validation/timing (tpu_stream_24.json): largest
#     host-traced on-chip execution, 6 qubits past the reference's
#     practical ceiling (/root/reference/models/adapt_vqe.py:299-304).
#   - 26/28/30-qubit single-chip energy evals (tpu_stream_big_{N}.json):
#     product-state closed-form validation, no host trace needed
#     (benchmarks/tpu_stream_big.py).  30q is opportunistic: 8 GB of
#     planes on a 16 GB chip; after 3 failed attempts it is skipped.
# Same probe-gated structure as tpu_campaign.sh; exits when done.
cd /root/repo
LOG=benchmarks/tpu_extras.log
for i in $(seq 1 200); do
  echo "=== extras cycle $i $(date +%H:%M:%S) ===" >> $LOG
  if ! timeout 90 python - "$i" >> $LOG 2>&1 <<'EOF'
import sys, time, numpy as np, jax, jax.numpy as jnp
salt = float(sys.argv[1]) * 3e-6 + (time.time() % 86400) * 1e-9
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
  if [ -f benchmarks/stream_expected_24.json ] && [ ! -f benchmarks/tpu_stream_24.json ]; then
    QSFH_STREAM_N=24 timeout 560 python benchmarks/tpu_stream.py >> $LOG 2>&1 \
      && echo "STREAM24 OK" >> $LOG
  fi
  for n in 26 28; do
    if [ ! -f benchmarks/tpu_stream_big_$n.json ]; then
      QSFH_STREAM_BIG_N=$n timeout 560 python benchmarks/tpu_stream_big.py >> $LOG 2>&1 \
        && echo "BIG$n OK" >> $LOG
    fi
  done
  if [ -f benchmarks/tpu_stream_big_28.json ] && \
     [ ! -f benchmarks/tpu_stream_big_30.json ] && \
     [ ! -f benchmarks/tpu_stream_big_30.skip ]; then
    if QSFH_STREAM_BIG_N=30 timeout 560 python benchmarks/tpu_stream_big.py >> $LOG 2>&1; then
      echo "BIG30 OK" >> $LOG
    else
      n30=$(( $(cat /tmp/big30_tries 2>/dev/null || echo 0) + 1 ))
      echo $n30 > /tmp/big30_tries
      echo "big30 attempt $n30 failed" >> $LOG
      [ $n30 -ge 3 ] && echo "30q attempts exhausted" > benchmarks/tpu_stream_big_30.skip
    fi
  fi
  if [ -f benchmarks/dynamics_expected.json ] && [ ! -f benchmarks/tpu_dynamics.json ]; then
    salt="$(python -c "import time; print(11e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
    QSFH_BENCH_SALT=$salt timeout 560 python benchmarks/tpu_dynamics.py >> $LOG 2>&1 \
      && echo "DYNAMICS OK salt=$salt" >> $LOG
  fi
  if [ -f benchmarks/sampling_expected.json ] && [ ! -f benchmarks/tpu_sampling.json ]; then
    salt="$(python -c "import time; print(13e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
    QSFH_BENCH_SALT=$salt timeout 560 python benchmarks/tpu_sampling.py >> $LOG 2>&1 \
      && echo "SAMPLING OK salt=$salt" >> $LOG
  fi
  if [ -f benchmarks/ite_expected.json ] && [ ! -f benchmarks/tpu_ite.json ]; then
    salt="$(python -c "import time; print(17e-6*$i + (int(time.time()) % 86400) * 1e-9)")"
    QSFH_BENCH_SALT=$salt timeout 560 python benchmarks/tpu_ite.py >> $LOG 2>&1 \
      && echo "ITE OK salt=$salt" >> $LOG
  fi
  done_all=1
  [ ! -f benchmarks/ite_expected.json ] || [ -f benchmarks/tpu_ite.json ] || done_all=0
  [ ! -f benchmarks/sampling_expected.json ] || [ -f benchmarks/tpu_sampling.json ] || done_all=0
  [ ! -f benchmarks/dynamics_expected.json ] || [ -f benchmarks/tpu_dynamics.json ] || done_all=0
  [ ! -f benchmarks/stream_expected_24.json ] || [ -f benchmarks/tpu_stream_24.json ] || done_all=0
  [ -f benchmarks/tpu_stream_big_26.json ] || done_all=0
  [ -f benchmarks/tpu_stream_big_28.json ] || done_all=0
  [ -f benchmarks/tpu_stream_big_30.json ] || [ -f benchmarks/tpu_stream_big_30.skip ] || done_all=0
  if [ "$done_all" = 1 ]; then
    echo "EXTRAS COMPLETE $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  sleep 120
done
