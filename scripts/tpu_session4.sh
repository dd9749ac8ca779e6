#!/bin/sh
# r4 session-5 TPU backlog (tunnel sick at session start, 2026-08-20 ~08:00Z).
# Run: nohup sh scripts/tpu_session4.sh > /tmp/tpu_session4.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

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
# single CPU core: wait out any CPU-bound run (pytest/dryrun) first
if [ -f /tmp/cpu_busy.pid ]; then
  while kill -0 "$(cat /tmp/cpu_busy.pid)" 2>/dev/null; do
    echo "waiting for CPU job $(cat /tmp/cpu_busy.pid)"
    sleep 120
  done
fi
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512)); print('gate2 ok:', float((x @ x)[0, 0]))" || exit 1

# 1. e2e u8 with the FIXED manifest (12 real steps/epoch, threaded
#    prefetch, honest post-fetch window timing) — steady-state capture
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12 --u8 \
  > /tmp/bench_e2e_u8_s5.json 2>&1

# 2. device trace of the 407 ms pretrain step: attribution for the NEXT
#    perf lever (post-DN buckets)
timeout 1700 python -u scripts/trace_step.py > /tmp/trace_s5.log 2>&1

# 3. full driver-format headline — rehearses the end-of-round capture and
#    warms ~/.jax_cache with the exact programs the driver will run
timeout 5400 python bench.py > /tmp/bench_headline_s5.json 2>&1

# 4. float e2e for the u8-vs-float on-TPU comparison
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12 \
  > /tmp/bench_e2e_f32_s5.json 2>&1

echo "TPU session 5 complete"
