#!/bin/sh
# Queued TPU measurements for the next live tunnel session, in priority
# order (single CPU core: strictly sequential; each stage bounded).
# Run: nohup sh scripts/tpu_session.sh > /tmp/tpu_session.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 0. backend sanity (fails fast if the tunnel is still down)
timeout 300 python -c "import jax; print('devices:', jax.devices())" || exit 1

# 1. LN-prologue step A/B (ROADMAP #1) — the round's top perf item; sweeps
#    FUSE_LN_QKV x FUSE_LN_MLP (4 variants, interleaved in one process)
timeout 3600 python -u scripts/probe_ln_qkv_step.py

# 1b. standalone fused pretrain capture (driver-format JSON for the record;
#     compare its ms_per_step against the default capture in step 3)
timeout 1800 python bench.py --mode pretrain --fuse-ln qkv,mlp

# 2. hardware-gated flash kernel tests (regression check after any wiring)
timeout 1800 env VJEPA2_TEST_TPU=1 python -m pytest tests/ops/test_flash_tpu.py -q

# 3. driver-format headline (ceiling + ViT-g encode + ViT-L pretrain)
timeout 2400 python bench.py

# 4. end-to-end real-mp4 pretrain step, float vs uint8-deferred pipelines
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12
timeout 1800 python bench.py --mode e2e --model vit_large --batch 8 --steps 12 --u8

# 5. fresh device-trace attribution of the pretrain step (ground truth for
#    the next perf decision: LN bucket, elementwise bucket, copies) — both
#    the default step and the fully LN-fused variant
timeout 1700 python -u scripts/trace_step.py
timeout 1700 python -u scripts/trace_step.py --fuse-ln qkv,mlp

# 6. AC + CEM MFU accounting (VERDICT r2 #6: numbers land in ROADMAP)
timeout 1800 python bench.py --mode ac
timeout 1200 python bench.py --mode cem

# 7. cooldown step at the reference per-GPU effective batch (64f@256 bs12 =
#    3 x bs4 microbatches via grad accumulation, remat)
timeout 2400 python bench.py --mode cooldown

echo "TPU session complete"
