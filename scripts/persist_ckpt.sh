#!/bin/bash
# Persist a training checkpoint into git (the box wipes logs/ between
# sessions — docs/RESULTS_R3.md; a ckpt committed under artifacts/ survives
# and lets the next session resume training / run DAgger stages without the
# ~80-min expert retrain).
#
# Usage: scripts/persist_ckpt.sh <run_dir_under_logs/ckpts> <iter> [msg]
#   e.g. scripts/persist_ckpt.sh open_drawer_ppo/expert_r3c_seed389 12000
set -e
cd "$(dirname "$0")/.."
RUN=${1:?run dir under logs/ckpts}
ITER=${2:?ckpt iteration}
SRC=logs/ckpts/${RUN}
DST=artifacts/${RUN}
mkdir -p "${DST}"
cp "${SRC}/model_${ITER}.ckpt" "${DST}/"
[ -f "${SRC}/teacher_reward.npy" ] && cp "${SRC}/teacher_reward.npy" "${DST}/"
du -sh "${DST}"
git add "${DST}"
# Pathspec keeps unrelated staged changes out of the persistence commit.
git commit -m "${3:-Persist ${RUN} ckpt @${ITER} (survives box reset)}

No-Verification-Needed: binary artifact persistence only" -- "${DST}"
