#!/bin/bash
# Round-5 follow-on campaign: runs after tpu_batch_r5.sh completes.
#
#   nohup bash scripts/tpu_batch_r5b.sh <wait_pid> > results/tpu_batch_r5b.log 2>&1 &
#
# 1. bench.py fresh run - the r5b source edits (box_ground_mu knob; rmappo
#    bench row capped at E=2048 after its 147 MB HBM compile OOM at 4096)
#    change the compile-cache keys, so this warms every program the driver's
#    end-of-round bench will run, and records the post-edit steady state.
# 2. OneAnt peak-attribution probe, round 2: the ant-box mu=0 probe REFUTED
#    the r4 ant-box attribution (peaks 3.24/2.61, not the multiply-band
#    ~10-11).  The remaining pair difference between 'average' and
#    'multiply' is box-ground (0.5 vs 0): whether the push-box glides or is
#    pinned.  Probe: average combine with ONLY box-ground forced to 0.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p results

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

timeout 3600 python bench.py 2>&1 | tail -1
timeout 1800 python bench.py 2>&1 | tail -1 | tee results/bench_r5b_local.json

for s in 1 2 3; do
  SEED=$s BOX_GROUND_MU=0.0 timeout 2400 python scripts/oneant_probe_r5.py 2>&1 | tail -4
done

echo "=== r5b TPU batch done ==="
