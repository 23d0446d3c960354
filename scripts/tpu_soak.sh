#!/bin/bash
# r5 on-chip flagship training soak (VERDICT r4 item 5).
#
# Exercises the production hot loop end-to-end on real TPU hardware at the
# flagship deliver_rgblidar geometry (1024^2, samples_per_gpu=1, grad_accum
# 4, layer-decay AdamW, nested remat, donated state, eval hook, ckpt +
# resume) on the learnable synthetic DELIVER set (tools/make_synth_deliver)
# — the closest in-environment analogue to the reference's 100-epoch runs
# (SURVEY 3.1; reference tools/train.py + dist_train.sh).
#
# Three phases:
#   A : 3 epochs straight (96 micro-steps), eval at epoch 3
#   B1: 2 epochs into a second work dir (no eval)
#   B2: --auto-resume the B dir to 3 epochs  -> exercises mid-run resume
# then asserts A and B reach BIT-IDENTICAL params/batch_stats/opt_state at
# step 96 (straight-through == checkpoint-resumed), i.e. the loader order,
# per-step RNG fold-in, BN stats, and MultiSteps accumulator all restore
# exactly.
#
# Usage: bash scripts/tpu_soak.sh [out_log]   (~25 min warm-cache)
set -u
LOG=${1:-/tmp/soak_r5.log}
DS=/tmp/synth_deliver
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

[ -d $DS ] || python tools/make_synth_deliver.py $DS 8 0
rm -rf /tmp/soak_a /tmp/soak_b

run() { # run_tpu-style retry loop, auto-resume makes retries cheap
  for i in 1 2 3 4 5; do
    python -u train.py deliver_rgblidar --data-root $DS --seed 0 \
      --deterministic --auto-resume \
      --cfg-options log_config.interval=8 checkpoint.max_keep_ckpts=2 "$@" \
      && return 0
    echo "[soak] attempt $i failed; retry in 90s" >&2; sleep 90
  done
  return 1
}

{
  echo "=== phase A: 3 epochs straight ==="
  run --work-dir /tmp/soak_a --max-epochs 3 \
      --cfg-options evaluation.interval=3 || exit 1
  echo "=== phase B1: 2 epochs ==="
  run --work-dir /tmp/soak_b --max-epochs 2 \
      --cfg-options evaluation.interval=99 || exit 1
  echo "=== phase B2: auto-resume to 3 epochs ==="
  run --work-dir /tmp/soak_b --max-epochs 3 \
      --cfg-options evaluation.interval=99 || exit 1
  echo "=== compare: A(step_96) vs B(resumed, step_96) ==="
  python -u - <<'EOF'
import jax, numpy as np
from multimodal_sam_adapter_tpu.engine.checkpoint import restore_checkpoint
a = restore_checkpoint("/tmp/soak_a/ckpts/step_96")
b = restore_checkpoint("/tmp/soak_b/ckpts/step_96")
bad = []
for part in ("params", "batch_stats", "opt_state"):
    la = jax.tree.leaves(a[part]); lb = jax.tree.leaves(b[part])
    assert len(la) == len(lb), (part, len(la), len(lb))
    for i, (x, y) in enumerate(zip(la, lb)):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            bad.append((part, i, float(np.max(np.abs(
                np.asarray(x, np.float64) - np.asarray(y, np.float64))))))
print("BITWISE-IDENTICAL" if not bad else f"MISMATCH {bad[:8]}")
EOF
} 2>&1 | tee $LOG
