#!/bin/bash
# Round-3 training pipeline (single tunneled TPU chip, run stages in order).
# Stage selection: scripts/pipeline_r3.sh <stage>
#   expert   — drawer PPO expert @4096, fixed reference dynamics (20/5)
#   evals    — split sweep of the expert's checkpoints
#   ceiling  — DAgger normal_state student (loop-proof: should ≈ teacher)
#   demos    — collect expert demos for BC pretrain
#   student  — mesh_tsdf DAgger student (BC-pretrained)
#   cube     — grasp_cube PPO (state-norm; no-norm measured non-converging)
#
# NB the box can reset between sessions (logs/ is wiped) — every stage
# re-runnable; ckpts save every 2000 iters for --resume recovery.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

EXP=expert_r3c_seed389
CKPT=logs/ckpts/open_drawer_ppo/${EXP}
# logs/ is wiped on box reset; fall back to git-persisted ckpts
# (scripts/persist_ckpt.sh → artifacts/) for the teacher-consuming stages.
if [ ! -d "${CKPT}" ] && [ -d "artifacts/open_drawer_ppo/${EXP}" ]; then
  CKPT=artifacts/open_drawer_ppo/${EXP}
fi

# Resolve the teacher ckpt per-FILE (a partially repopulated logs/ must not
# mask artifacts/ when only artifacts holds the requested iter), defaulting
# TEA_ITER to the highest iteration present across both dirs.
resolve_teacher() {
  local dirs=("logs/ckpts/open_drawer_ppo/${EXP}" "artifacts/open_drawer_ppo/${EXP}")
  local d f it best="" best_it=-1
  if [ -n "${TEA_ITER:-}" ]; then
    for d in "${dirs[@]}"; do
      if [ -f "${d}/model_${TEA_ITER}.ckpt" ]; then
        echo "${d}/model_${TEA_ITER}.ckpt"; return
      fi
    done
    echo "teacher model_${TEA_ITER}.ckpt not found in ${dirs[*]}" >&2; exit 3
  fi
  for d in "${dirs[@]}"; do
    for f in "${d}"/model_*.ckpt; do
      [ -f "$f" ] || continue
      it=$(basename "$f" .ckpt); it=${it#model_}
      if [ "$it" -gt "$best_it" ]; then best_it=$it; best=$f; fi
    done
  done
  [ -n "$best" ] || { echo "no teacher ckpt found in ${dirs[*]}" >&2; exit 3; }
  echo "$best"
}

case "${1:?stage}" in
expert)
  python train.py --taskcfg open_drawer --algocfg ppo \
    --exp_name ${EXP} \
    --algo.num_envs 4096 \
    --algo.tricks.use_state_norm \
    --algo.max_iterations 30000 \
    --algo.save_frequence 2000 \
    --algo.save_teacher_reward \
    ${RESUME:+--resume ${RESUME}}
  ;;
evals)
  # EXTRA flips use_state_norm (yaml default True) to match the no-norm
  # expert ckpt — bool flags flip the default, they don't set True.
  EXTRA="--algo.tricks.use_state_norm" \
  scripts/test.sh open_drawer_ppo ${EXP} open_drawer \
    "train valIntra valInter" "${ITERS:-10000 20000 30000}"
  ;;
ceiling)
  # standalone assignment first: `exit 3` inside $() only kills the
  # subshell, but set -e aborts on a failed assignment (advisor r4)
  teacher=$(resolve_teacher)
  python train.py --taskcfg open_drawer --algocfg dagger \
    --exp_name ceiling_r3_seed17 \
    --algo.obs_mode normal_state \
    --algo.model.network.name MLP \
    --algo.num_envs 1024 \
    --algo.buf_size 64 \
    --algo.minibatch_cap 2048 \
    --algo.max_iterations 3000 \
    --algo.teacher "$teacher"
  ;;
demos)
  teacher=$(resolve_teacher)
  python tools/collect_demos.py \
    --teacher "$teacher" \
    --only_success --episodes ${EPISODES:-8} \
    --out logs/demos/open_drawer_r3 "${@:2}"
  ;;
bc)
  # BC-pretrain on the collected demos (reference recipe: BC init -> DAgger)
  python train.py --taskcfg open_drawer --algocfg bc \
    --exp_name bc_r3_seed11 \
    --algo.data_path logs/demos/open_drawer_r3 \
    --algo.max_iterations ${ITERS:-1000}
  ;;
student)
  # PRETRAIN: BC ckpt path (stage bc); OFFLINE: demo dir (stage demos).
  # teacher_reward intentionally unset: classic resets measured 2x better.
  teacher=$(resolve_teacher)
  python train.py --taskcfg open_drawer --algocfg dagger \
    --exp_name student_r3_seed23 \
    --algo.num_envs 16 \
    --algo.max_iterations 10000 \
    --algo.teacher "$teacher" \
    ${PRETRAIN:+--pretrain ${PRETRAIN}} \
    ${OFFLINE:+--algo.offline_data_pth ${OFFLINE}} \
    ${RESUME:+--resume ${RESUME}}
  ;;
depth_student)
  # rendered-depth sensor path (VERDICT r2 #7): depth cameras -> on-device
  # TSDF fusion -> Conv3D student.  Short run: the deliverable is a
  # committed learning curve proving the full pipeline trains end-to-end.
  teacher=$(resolve_teacher)
  python train.py --taskcfg open_drawer --algocfg dagger \
    --exp_name depth_student_r3_seed5 \
    --algo.obs_mode depth_tsdf \
    --algo.num_envs 16 \
    --algo.buf_size 600 \
    --algo.max_iterations ${ITERS:-2000} \
    --algo.eval_frequence 500 \
    --algo.save_frequence 500 \
    --algo.teacher "$teacher" \
    ${OFFLINE:+--algo.offline_data_pth ${OFFLINE}} \
    ${RESUME:+--resume ${RESUME}}
  ;;
cube)
  # state-norm required: no-norm cube PPO measured non-converging (r2);
  # it is the yaml DEFAULT (True) — passing the bool flag would FLIP it off.
  # r5 run: retrain on the fixed contacts (b359613 + r5 torque-scale cap).
  python train.py --taskcfg grasp_cube --algocfg ppo \
    --exp_name ${CUBE_EXP:-cube_r5_seed101} \
    --algo.num_envs 4096 \
    --algo.max_iterations ${ITERS:-30000} \
    --algo.save_frequence 2000 \
    ${RESUME:+--resume ${RESUME}}
  ;;
*) echo "unknown stage $1" >&2; exit 2 ;;
esac
