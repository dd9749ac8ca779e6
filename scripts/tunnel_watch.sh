#!/bin/sh
# Tunnel health watcher: every POLL_S seconds, try a trivial TPU matmul
# with a hard timeout. Log one line per poll to /tmp/tunnel_watch.log.
# A session is "healthy" when the warm matmul lands in < GATE_S seconds.
# (The axon remote-compile path can hang for hours; jax.devices() alone
# is NOT a health signal — it succeeds while compiles hang.)
POLL_S=${POLL_S:-600}
GATE_S=${GATE_S:-240}
while true; do
  t0=$(date +%s)
  out=$(timeout "$GATE_S" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('ok', float((x @ x)[0, 0]))" 2>&1 | tail -1)
  t1=$(date +%s)
  echo "$(date -u +%FT%TZ) dt=$((t1 - t0))s out=$out" >> /tmp/tunnel_watch.log
  case "$out" in
    ok*) echo "$(date -u +%FT%TZ) TUNNEL HEALTHY (${GATE_S}s gate)" >> /tmp/tunnel_watch.log ;;
  esac
  sleep "$POLL_S"
done
