#!/bin/bash
# Poll for axon remote-compile recovery after a worker crash: a FRESH
# odd-shape compile either completes (recovered) or hangs (still wedged).
# Logs one line per attempt; exits when recovered.
while true; do
  d=$((RANDOM % 900 + 100))
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones(($d, 37))
print('probe ok', float((x @ x.T).sum()))" >/dev/null 2>&1; then
    echo "[$(date +%H:%M:%S)] COMPILE SERVICE RECOVERED"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] still wedged (probe d=$d timed out)"
  sleep 120
done
