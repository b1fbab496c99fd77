#!/bin/bash
# Round-5 TPU campaign (serial; one chip).  Run AFTER all source edits are
# frozen (axon compile-cache keys include source line numbers - see
# BASELINE.md measurement methodology).
#
#   nohup bash scripts/tpu_batch_r5.sh > results/tpu_batch_r5.log 2>&1 &
#
# Order: the mappo/happo schedule profiler first (its numbers decide whether
# the new 'sequential' default stands), then the headline bench (shares
# compiled programs with the profiler), kernel re-validation, the OneAnt
# peak-attribution probes, and the TenAnt impact-sensitivity runs.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p results

# 1. MAPPO-vs-HAPPO inversion: sequential vs stacked vs happo, phase splits,
#    epoch scaling (VERDICT r4 item 2)
timeout 14400 python scripts/profile_mappo_happo_r5.py 2>&1 | tail -30

# 2. headline bench + full zoo rows (VERDICT r4 item 4); run twice - first
#    warms any remaining compiles, second is the steady-state number
timeout 14400 python bench.py 2>&1 | tail -3
timeout 3600 python bench.py 2>&1 | tail -1 | tee results/bench_r5_local.json

# 3. fused-kernel agreement + speedup re-validation under the r5 physics
#    plumbing (ant_box_mu/hc_cap default-off paths must be bit-quiet)
timeout 7200 python scripts/validate_fused_tpu.py 2>&1 | tail -15 \
    | tee results/validate_fused_r5.log

# 4. OneAnt peak attribution (VERDICT r4 item 3): average combine with ONLY
#    the ant-box pair forced to mu=0; 3 seeds + 1 shipped-average control
for s in 1 2 3; do
  SEED=$s ANT_BOX_MU=0.0 timeout 7200 python scripts/oneant_probe_r5.py 2>&1 | tail -4
done
SEED=1 timeout 7200 python scripts/oneant_probe_r5.py 2>&1 | tail -4

# 5. impact-regime benignness (VERDICT r4 item 5b): the r5 CPU sweeps showed
#    NO contact constant reaches MuJoCo's hard-impact response (structural
#    penalty-vs-constraint difference), so train under the response-envelope
#    EXTREMES (36% dx spread > the 23% MuJoCo gap), 2 seeds each
for s in 1 2; do
  for v in default stiff soft; do
    SEED=$s VARIANT=$v timeout 7200 python scripts/tenant_hc_sensitivity_r5.py 2>&1 | tail -3
  done
done

echo "=== r5 TPU batch done ==="
