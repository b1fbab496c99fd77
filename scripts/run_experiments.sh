#!/usr/bin/env bash
# Batch experiment launcher - counterpart of the reference's
# agents/scripts/run_experiments.sh (TASK x ALGO over 3 seeds), extended to
# sweep the tracked validation matrix (BASELINE.json "configs") when invoked
# with no arguments.
#
#   scripts/run_experiments.sh TASK ALGO NUM_ENVS [SEEDS] [extra cli args...]
#     -> seeds 0..SEEDS-1 (default 3) of one task/algo pair, per-seed logdirs
#   scripts/run_experiments.sh
#     -> the full tracked matrix (OneAnt+PPO, TenAnt+PPO/MAPPO/HAPPO/
#        DDPG/TD3/SAC, MultiIngenuity+PPO), one seed each
#
# Logs land under logs/<task>/<algo>/seed<N>/ (tfevents + CSV + checkpoints),
# which is what utils/logger/plotter.py consumes.
set -euo pipefail
cd "$(dirname "$0")/.."

run_one() {
  local task=$1 algo=$2 num_envs=$3 seed=$4
  shift 4
  echo "=== ${task} + ${algo} (E=${num_envs}, seed ${seed}) ==="
  python train.py --task "${task}" --algo "${algo}" --num_envs "${num_envs}" \
    --seed "${seed}" --headless "$@"
}

if [ "$#" -ge 3 ]; then
  TASK=$1 ALGO=$2 NUM_ENVS=$3
  SEEDS="${4:-3}"
  shift 3
  if [ "$#" -ge 1 ]; then shift; fi
  echo "Experiments started."
  for seed in $(seq 0 $((SEEDS - 1))); do
    run_one "$TASK" "$ALGO" "$NUM_ENVS" "$seed" "$@"
  done
  echo "Experiments ended."
  exit 0
fi

# no args: the tracked validation matrix (BASELINE.md "Tracked configs")
NUM_ENVS="${NUM_ENVS:-1024}"
MAX_ITER="${MAX_ITER:-200}"
echo "Experiments started (tracked matrix, E=${NUM_ENVS}, ${MAX_ITER} iters each)."
run_one OneAnt          ppo   "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one TenAnt          ppo   "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one TenAnt          mappo "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one TenAnt          happo "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one TenAnt          ddpg  "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one TenAnt          td3   "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one TenAnt          sac   "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
run_one MultiIngenuity  ppo   "$NUM_ENVS" 0 --max_iterations "$MAX_ITER"
echo "Experiments ended."
