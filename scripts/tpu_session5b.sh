#!/bin/sh
# Round-5 session-2 TPU backlog: saveable-residual validation + remat-policy
# A/B + remaining VERDICT probes. Waits for tunnel health (same gate as
# tpu_session.sh) so it can be queued across an outage.
# Run: nohup sh scripts/tpu_session5b.sh > /tmp/tpu_session5b.log 2>&1 &
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

# 1. hardware flash tests FIRST: the saveable-residual restructure changed
#    the production kernel dispatch in both families — nothing else is
#    trustworthy until these pass on the real chip.
timeout 2400 env VJEPA2_TEST_TPU=1 python -m pytest tests/ops/test_flash_tpu.py -q || exit 1

# 2. flagship neutrality check: the restructure must NOT move the 407 ms
#    pretrain headline (no remat there — same kernels, same residuals).
timeout 2400 python bench.py --mode pretrain

# 3. the money A/B: remat policies on the cooldown step (VERDICT #1)
timeout 7200 python -u scripts/probe_remat_cooldown.py

# 3b. remat tax at the cooldown shape (64f bs2, with vs without remat)
timeout 2400 python bench.py --mode pretrain --model vit_large --frames 64 --batch 2 --steps 6 --remat
timeout 2400 python bench.py --mode pretrain --model vit_large --frames 64 --batch 2 --steps 6

# 4. AC step under save_attn (695 ms r5s1 baseline; cross-process, so only
#    trust a >5% move)
timeout 2400 python bench.py --mode ac --remat-policy save_attn

# 5. LN numerics A/B on the encode headline (VERDICT #3)
timeout 4500 python -u scripts/probe_ln_encode.py

# 6. pretrain dispatch-overhead attribution (VERDICT #4)
timeout 3000 python -u scripts/probe_dispatch_pretrain.py

# 7. giant-scale CEM plan (VERDICT #10)
timeout 3600 python bench.py --mode cem --model vit_giant_xformers --cem-full --steps 8

# 8. H2D-serialization ceiling (VERDICT #8)
timeout 1200 python -u scripts/probe_h2d_ceiling.py

echo "TPU session5b complete"
