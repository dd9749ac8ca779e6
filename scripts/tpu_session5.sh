#!/bin/sh
# Round-5 TPU measurement backlog, in VERDICT priority order. Waits for a
# running probe PID (if any) before starting; each stage bounded.
# Run: nohup sh scripts/tpu_session5.sh > /tmp/tpu_session5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# wait for an in-flight probe (e.g. probe_ac_dn) to release the chip
if [ -f /tmp/probe_ac.pid ]; then
  while kill -0 "$(cat /tmp/probe_ac.pid)" 2>/dev/null; do
    echo "waiting for probe $(cat /tmp/probe_ac.pid)"
    sleep 120
  done
fi

# health gate (300 s; hang mode is what we reject — see tpu_session.sh)
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('warm matmul ok:', float((x @ x)[0, 0]))" || exit 1

# 1. cooldown attribution (VERDICT #1): trace one 64f@256 bs12 accum3 step
timeout 3600 python -u scripts/trace_step.py --cooldown --steps 2

# 1b. remat cost at the cooldown shape: same effective work per clip with
#     and without recompute (64f bs2 fits without remat since flash, r3).
#     If the non-remat per-clip cost is ~25% lower, the cooldown MFU gap is
#     remat recompute and the config should shrink microbatches instead.
timeout 2400 python bench.py --mode pretrain --model vit_large --frames 64 --batch 2 --steps 6 --remat
timeout 2400 python bench.py --mode pretrain --model vit_large --frames 64 --batch 2 --steps 6

# 2. LN numerics A/B on the encode headline (VERDICT #3)
timeout 4500 python -u scripts/probe_ln_encode.py

# 3. pretrain dispatch-overhead attribution (VERDICT #4)
timeout 3000 python -u scripts/probe_dispatch_pretrain.py

# 4. hardware flash tests (regression gate after the DN segment change)
timeout 1800 env VJEPA2_TEST_TPU=1 python -m pytest tests/ops/test_flash_tpu.py -q

# 5. re-capture cooldown + ac after any fixes land
timeout 2400 python bench.py --mode cooldown
timeout 2400 python bench.py --mode ac

# 6. giant-scale CEM plan (VERDICT #10)
timeout 3600 python bench.py --mode cem --model vit_giant_xformers --cem-full --steps 8

# 7. H2D-serialization ceiling (VERDICT #8: measured number, not projection)
timeout 1200 python -u scripts/probe_h2d_ceiling.py

echo "TPU session5 complete"
