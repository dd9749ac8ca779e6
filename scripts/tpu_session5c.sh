#!/bin/sh
# Round-5 session-3 TPU backlog: close out VERDICT #1 (cooldown MFU) —
# attribute the residual 4983 ms under save_attn_qkv and A/B the new
# 'save_attn_qkv_h' policy (also saves the fc1 pre-activation, leaving the
# attn out-projection as the only recompute GEMM). Waits for tunnel health
# (same gate as tpu_session.sh) so it can be queued across an outage.
# Run: nohup sh scripts/tpu_session5c.sh > /tmp/tpu_session5c.log 2>&1 &
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

# 1. the money A/B: save_attn_qkv (shipped default, 4983.1 ms r5s2) vs
#    save_attn_qkv_h at the cooldown shape. >2% move = ship the new default.
timeout 7200 python -u scripts/probe_remat_cooldown.py \
  --variants save_attn_qkv,save_attn_qkv_h

# 2. residual attribution: device trace of the cooldown step under the
#    SHIPPED policy (the r5s2 trace was full-remat). Buckets the remaining
#    4983 ms so the "floor or fixable" verdict is written from evidence.
timeout 3600 python -u scripts/trace_step.py --cooldown \
  --remat-policy save_attn_qkv --steps 2

# 3. AC step under the wider policies (save_attn default = 629 ms r5s2;
#    cross-process, so only trust a >5% move)
timeout 2400 python bench.py --mode ac --remat-policy save_attn_qkv
timeout 2400 python bench.py --mode ac --remat-policy save_attn_qkv_h

# 4. flagship neutrality: the mlp_h checkpoint_name tags are transparent
#    without remat, but verify the 407 ms pretrain headline did not move.
timeout 2400 python bench.py --mode pretrain

echo "TPU session5c complete"
