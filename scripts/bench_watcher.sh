#!/bin/bash
# Watch the TPU relay; when it answers, immediately run bench.py.
# Keeps trying until a leg reports a non-zero value, then stops.
# Log: /tmp/bench_watcher.log ; result: /tmp/bench_r4_live.json
cd /root/repo
while true; do
  ts=$(date +%H:%M:%S)
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28" >/dev/null 2>&1; then
    echo "$ts alive -> bench" >> /tmp/bench_watcher.log
    timeout 3500 python bench.py > /tmp/bench_r4_live.json 2>>/tmp/bench_watcher.log
    val=$(python - <<'EOF'
import json
try:
    print(json.load(open("/tmp/bench_r4_live.json"))["value"])
except Exception:
    print(0)
EOF
)
    echo "$ts bench value=$val" >> /tmp/bench_watcher.log
    case "$val" in
      0|0.0) : ;;  # relay died mid-leg; keep watching
      *) echo "$ts SUCCESS" >> /tmp/bench_watcher.log; exit 0 ;;
    esac
  else
    echo "$ts wedged" >> /tmp/bench_watcher.log
  fi
  sleep 120
done
