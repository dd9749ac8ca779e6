#!/bin/sh
# Queued TPU measurements for the next live tunnel session, in priority
# order (single CPU core: strictly sequential; each stage bounded).
# Run: nohup sh scripts/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
#
# r4 state: regression bisect DONE (536 ms validated), LN A/B DONE
# (rejected). Remaining backlog below.
set -x
cd "$(dirname "$0")/.."

# 0. backend sanity + health gate: a trivial compile must land in <120 s
#    (a sick session measured 171.8 s for a 256x256 matmul — numbers from
#    such sessions are noise; r4s2 saw a 256x256 compile hang past 400 s
#    while jax.devices() kept succeeding). Instead of exiting, WAIT for
#    the tunnel to heal — poll the gate every 10 min for up to
#    WAIT_HOURS (default 10) so a queued backlog starts measuring the
#    moment a healthy window opens.
WAIT_HOURS=${WAIT_HOURS:-10}
GATE_S=${GATE_S:-300}
deadline=$(( $(date +%s) + WAIT_HOURS * 3600 ))
# Gate at 300 s, not 120: r4s1 produced VALID interleaved step timings
# (agreement 0.9974) in a session whose compiles took 150-500 s — slow
# remote compile degrades compile_s, not steady-state chained step timing.
# What the gate must reject is the total-hang mode (matmul never returns).
until timeout "$GATE_S" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('warm matmul ok:', float((x @ x)[0, 0]))"
do
  [ "$(date +%s)" -gt "$deadline" ] && { echo "tunnel never healed"; exit 1; }
  echo "health gate failed; retry in 300s ($(date -u +%FT%TZ))"
  sleep 300
done
# single CPU core: wait for any CPU-bound probe (e.g. probe_mask_stats)
# to finish before timing anything
if [ -f /tmp/probe_mask.pid ]; then
  while kill -0 "$(cat /tmp/probe_mask.pid)" 2>/dev/null; do
    echo "waiting for CPU probe $(cat /tmp/probe_mask.pid) to finish"
    sleep 120
  done
fi
# re-confirm the tunnel answers right before the first timed stage
timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512)); print('gate2 ok:', float((x @ x)[0, 0]))" || exit 1

# 1. fresh device-trace attribution of the FIXED 536 ms pretrain step —
#    ground truth for the predictor narrow-head layout decision
#    (how many ms do the 4x-padded [8,12,1664,32] tensors actually cost?)
timeout 1700 python -u scripts/trace_step.py

# 1b. narrow-head DN layout A/B (NARROW_DN, ships default-ON pending this
#     measurement — flip the default in models/modules.py if it loses)
timeout 4500 python -u scripts/probe_dn_step.py

# 2. encode-path cap A/B: does uncapped full-N k win the ViT-g encode
#    headline back (~8% of flash fwd) while the train program still holds?
timeout 3000 python -u scripts/probe_encode_caps.py

# 3. hardware-gated flash kernel tests (regression check after any wiring)
timeout 1800 env VJEPA2_TEST_TPU=1 python -m pytest tests/ops/test_flash_tpu.py -q

# 4. cooldown step at the reference per-GPU effective batch (64f@256 bs12 =
#    3 x bs4 microbatches via grad accumulation, remat) — first-ever capture
timeout 2400 python bench.py --mode cooldown

# 5. end-to-end real-mp4 pretrain step, uint8-deferred pipeline (first-ever
#    on-TPU capture; float comparison after if time allows)
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12 --u8
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12

# 6. AC + CEM captures (also ride the headline extras now, but standalone
#    JSONs give the ROADMAP numbers)
timeout 1800 python bench.py --mode ac
timeout 1200 python bench.py --mode cem

# 7. full driver-format headline WITH the new extras — rehearses the
#    end-of-round capture and warms ~/.jax_cache with the exact programs
timeout 5400 python bench.py

echo "TPU session complete"
