#!/bin/bash
# Secondary healthy-window consumer: artifacts beyond the main campaign.
#   - 24-qubit streaming validation/timing (tpu_stream_24.json): the
#     largest on-chip execution, 6 qubits past the reference's practical
#     ceiling (/root/reference/models/adapt_vqe.py:299-304).
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
  done_all=1
  [ ! -f benchmarks/stream_expected_24.json ] || [ -f benchmarks/tpu_stream_24.json ] || done_all=0
  if [ "$done_all" = 1 ]; then
    echo "EXTRAS COMPLETE $(date +%H:%M:%S)" >> $LOG
    exit 0
  fi
  sleep 120
done
