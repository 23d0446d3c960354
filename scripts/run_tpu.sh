#!/bin/bash
# Run a TPU script with retries around tunnel-lease cooldowns.
for i in $(seq 1 25); do
  PYTHONPATH=/root/repo python -u "$@" && exit 0
  echo "[run_tpu] attempt $i failed; retrying in 90s" >&2
  sleep 90
done
exit 1
