#!/bin/bash
# Run a TPU script with retries around tunnel-lease cooldowns.
# NB: PYTHONPATH must retain /root/.axon_site (the TPU plugin's sitecustomize).
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
for i in $(seq 1 25); do
  python -u "$@" && exit 0
  echo "[run_tpu] attempt $i failed; retrying in 90s" >&2
  sleep 90
done
exit 1
