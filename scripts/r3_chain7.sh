#!/bin/bash
# Round-3 TPU campaign, chain 7 (after chain 6 adopted the aggressive
# stopping pair):
#   1) LAGGED-convection bench A/B at 120k + 1.9M under the calibrated
#      defaults — chain 6 measured +45% at 120k (6.877 vs 4.752); if the
#      ratio holds at scale this is the round's biggest single-chip lever
#   2) stage-1 seed regeneration (the saturated-state checkpoints were
#      lost to the machine swap; tests/data series files are forces-only)
#   3) stage-2 PHYSICS GUARD for lagged convection: develop the 148k-DoF
#      limit cycle under lagged + the aggressive stopping pair and compare
#      settled-half St / Cd_max / Cl against the production values
#      (St 0.3001 / Cd_max 3.2477 / Cl 0.9908) — the chain-5/6 rule: no
#      stopping/discretization knob becomes a bench default without it
#   4) 7.6M lagged point (chain-6 newton reference: 0.021 steps/s)
#   5) winmom runtime-fault bisect re-run (chain-6 logs lost with /tmp):
#      refine-5 at S=256, refine-4 at vmem=32M
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain7
mkdir -p $R

# 1) lagged bench at 120k + 1.9M (one invocation, subprocess-per-size)
gate
BENCH_CONVECTION=lagged BENCH_REFINES=3,5 BENCH_SIZE_TIMEOUT=2400 \
  timeout 6000 python bench.py \
  > $R/bench_lagged_35.json 2> $R/bench_lagged_35.err
tail -1 $R/bench_lagged_35.json

# 2) stage-1 seed regeneration (37k DoF, production tolerances, BDF2;
#    cold perturbation -> saturated limit cycle in ~20 s physical)
gate
ST_CKPT=st1_r3.npz ST_OUT=$R/stage1_regen.npz SHED_CHUNK=25 \
  timeout 7200 python scripts/schafer_turek.py 5000 0.03 1 4.0e-3 \
  > $R/stage1_regen.log 2>&1
tail -6 $R/stage1_regen.log

# 3) stage-2 lagged guard: prolong the stage-1 saturated state to refine-2
#    and develop under the CANDIDATE config (lagged + newton 1e-2 +
#    linear 1e-1, production pressure/correction stopping). 3200 steps at
#    dt 2.5e-3 = 8 s physical (~24 periods; settled half ~12).
if [ -f st1_r3.npz ]; then
  gate
  ST_SEED_CKPT=st1_r3.npz ST_SEED_REFINE=1 ST_CONVECTION=lagged \
    ST_NEWTON_RTOL=1.0e-2 ST_LINEAR_RTOL=1.0e-1 \
    ST_CKPT=st2_lagged_ckpt.npz ST_OUT=$R/stage2_lagged.npz SHED_CHUNK=10 \
    timeout 14400 python scripts/schafer_turek.py 3200 0.03 2 2.5e-3 \
    > $R/stage2_lagged_guard.log 2>&1
  tail -6 $R/stage2_lagged_guard.log
fi

# 4) 7.6M lagged point (same invocation class as chain-6's newton 0.021)
gate
BENCH_CONVECTION=lagged BENCH_REFINES=6 BENCH_SIZE_TIMEOUT=3600 \
  timeout 4800 python bench.py \
  > $R/bench_lagged_r6.json 2> $R/bench_lagged_r6.err
tail -1 $R/bench_lagged_r6.json

# 5) winmom bisect: refine-5 smaller windows, refine-4 reduced vmem
gate
WM_REFINE=5 WM_S=256 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r5_s256.log 2>&1
tail -4 $R/winmom_r5_s256.log
gate
WM_REFINE=4 FLOW_VMEM_LIMIT_MB=32 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r4_v32.log 2>&1
tail -4 $R/winmom_r4_v32.log

echo CHAIN7_DONE
