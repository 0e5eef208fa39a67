#!/bin/bash
# Poll the axon tunnel: write one status line per probe to /tmp/tunnel_status.
# Each probe is a fresh process with a hard watchdog (wedged PJRT init can't
# be interrupted by signals — the child just _exits).
while true; do
  out=$(timeout 240 python -c "
import threading, os, time
def die():
    time.sleep(210); os._exit(3)
threading.Thread(target=die, daemon=True).start()
import jax
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((8, 128), jnp.float32)
print('ALIVE', d[0].platform, float(x.sum()))
" 2>/dev/null | tail -1)
  ts=$(date -u +%H:%M:%S)
  if [[ "$out" == ALIVE* ]]; then
    echo "$ts ALIVE" >> /tmp/tunnel_status
    exit 0
  else
    echo "$ts DEAD" >> /tmp/tunnel_status
  fi
  sleep 240
done
