#!/bin/bash
# Checkpoint eval sweep (≙ reference scripts/test.sh:39-43): evaluate a run's
# checkpoints over the data splits.
#
# usage: scripts/test.sh <group> <run_id> <task> [splits...] [iters...]
# e.g.:  scripts/test.sh open_drawer_ppo myexp_seed7 open_drawer \
#            "train valIntra valInter" "5000 10000"

set -e
GROUP=${1:?group}
RUN=${2:?run id}
TASK=${3:?taskcfg}
SPLITS=${4:-"train valIntra valInter"}
ITERS=${5:-""}

CKPT_DIR="./logs/ckpts/${GROUP}/${RUN}"
if [ -z "$ITERS" ]; then
  ITERS=$(ls "$CKPT_DIR" | sed -n 's/model_\([0-9]*\).ckpt/\1/p' | sort -n)
fi

# EXTRA: additional train.py flags (e.g. EXTRA="--algo.tricks.use_state_norm"
# to FLIP the yaml default and match a no-norm checkpoint — bool flags flip).
for it in $ITERS; do
  for split in $SPLITS; do
    echo "=== eval iter $it split $split ==="
    python train.py --taskcfg "$TASK" --test_only \
      --exp_name "$RUN" \
      --task.asset.splits "$split" \
      ${EXTRA:-} \
      --resume "${CKPT_DIR}/model_${it}.ckpt"
  done
done
