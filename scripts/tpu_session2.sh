#!/bin/sh
# Follow-up TPU backlog (r4 session 3): reruns the stages the first r4s2
# session lost — stages 4-5 crashed mid-edit (the DN block-policy fix was
# landing while the session script launched fresh processes against the
# half-edited tree), and stages 1/1b crashed on the DN lane-rule bug the
# fix addresses. Waits for any prior session script to finish, then for
# tunnel health.
# Run: nohup sh scripts/tpu_session2.sh > /tmp/tpu_session_r4s3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# wait for a prior tpu_session.sh to finish (single chip + single core)
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

# 1. hardware-gated flash tests, now INCLUDING the DN family at the real
#    predictor shape (N=1664 lane-legal plan) — first hardware validation
#    of the fixed block policy
timeout 2400 env VJEPA2_TEST_TPU=1 python -m pytest tests/ops/test_flash_tpu.py -q

# 2. narrow-head DN layout step-level A/B (NARROW_DN default is OFF; flip
#    it on in models/modules.py only if this measures a win/neutral)
timeout 4500 python -u scripts/probe_dn_step.py

# 3. fresh device-trace attribution of the 536 ms pretrain step
timeout 1700 python -u scripts/trace_step.py

# 4. cooldown step at the reference per-GPU effective batch (64f@256 bs12 =
#    3 x bs4 microbatches via grad accumulation, remat) — first-ever capture
timeout 2400 python bench.py --mode cooldown

# 5. end-to-end real-mp4 pretrain step, uint8-deferred vs float pipeline
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12 --u8
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12

echo "TPU session 2 complete"
