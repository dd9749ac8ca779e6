#!/bin/sh
# r4 session 3 follow-up: after the tpu_session2 backlog finishes, warm the
# persistent compile cache with the EXACT driver capture (bare `python
# bench.py` headline) and record the result. Compile cost through the
# tunnel dominates cold captures (r4s1 autopsy), so the warm run both
# yields this session's numbers and makes the driver's end-of-round
# capture hit ~/.jax_cache.
# Run: nohup sh scripts/tpu_session3.sh > /tmp/tpu_session_r4s3b.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

if [ -f /tmp/tpu_session.pid ]; then
  while kill -0 "$(cat /tmp/tpu_session.pid)" 2>/dev/null; do
    echo "waiting for prior TPU session $(cat /tmp/tpu_session.pid)"
    sleep 120
  done
fi
echo $$ > /tmp/tpu_session.pid

WAIT_HOURS=${WAIT_HOURS:-10}
GATE_S=${GATE_S:-300}
deadline=$(( $(date +%s) + WAIT_HOURS * 3600 ))
until timeout "$GATE_S" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('warm matmul ok:', float((x @ x)[0, 0]))"
do
  [ "$(date +%s)" -gt "$deadline" ] && { echo "tunnel never healed"; exit 1; }
  echo "health gate failed; retry in 300s ($(date -u +%FT%TZ))"
  sleep 300
done

timeout 5400 python bench.py | tee /tmp/bench_headline_r4s3.json

echo "TPU session 3 complete"
