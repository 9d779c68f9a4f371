#!/bin/bash
# Probe the TPU relay every 5 min; append status to /tmp/relay_status.log.
# When the relay answers, the last line will contain "ALIVE".
while true; do
  ts=$(date +%H:%M:%S)
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28
print('ok')" >/dev/null 2>&1; then
    echo "$ts ALIVE" >> /tmp/relay_status.log
  else
    echo "$ts wedged" >> /tmp/relay_status.log
  fi
  sleep 300
done
