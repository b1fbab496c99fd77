#!/usr/bin/env bash
# Multi-PROCESS CLI launch on localhost (SURVEY.md section 2.4/5): the same
# `python -m massive_marl_tpu.cli.train` command on every "host", plus the
# three MMT_* env vars.  On a real TPU pod each process owns one host's
# chips and the collectives ride ICI/DCN; here each process owns CPU devices
# and they ride Gloo - same program, same code path (cli/train.py
# setup_distributed -> parallel/mesh.init_distributed).
#
# Usage: scripts/run_multiprocess.sh [NPROC] [extra cli args...]
# Equivalence-oracle version (asserts sharded == single-process params):
#   python scripts/run_multiprocess.py --nproc 2
set -euo pipefail
cd "$(dirname "$0")/.."

NPROC="${1:-2}"
shift || true
PORT="${MMT_PORT:-$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("localhost", 0)); print(s.getsockname()[1]); s.close()
EOF
)}"

ARGS=("$@")
if [ "${#ARGS[@]}" -eq 0 ]; then
  ARGS=(--task TenAnt --algo mappo --num_envs 8 --max_iterations 2
        --headless --logdir /tmp/mmt_multiproc)
fi

PIDS=()
for i in $(seq 0 $((NPROC - 1))); do
  MMT_COORDINATOR="localhost:${PORT}" MMT_NUM_PROCESSES="${NPROC}" \
  MMT_PROCESS_ID="${i}" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=${MMT_LOCAL_DEVICES:-1}" \
  python -m massive_marl_tpu.cli.train "${ARGS[@]}" &
  PIDS+=($!)
done

RC=0
for p in "${PIDS[@]}"; do
  wait "$p" || RC=1
done
exit $RC
