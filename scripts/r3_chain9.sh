#!/bin/bash
# Round-3 TPU campaign, chain 9 (after chain 8): pressure/correction
# stopping calibration — the last unloosened knobs in the bench config.
# The increment-form solves make their rtol increment-relative, so a
# looser candidate is plausible; but pressure/correction slop is EXACTLY
# the mechanism that damped the Hopf mode pre-increment-form, so the
# stage-2 guard is mandatory (resumed from the saturated lagged
# checkpoint of chain 7 — 1600 steps instead of a full redevelopment).
#   1) guard stretch: lagged + aggressive + pressure 3e-4 + correction
#      1e-4, 1600 steps at dt 2.5e-3 from the saturated state; settled
#      half must reproduce St 0.3001 / Cd_max ~3.250 / Cl ~0.99
#   2) 1.9M and 120k bench points with the candidate knobs
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain9
mkdir -p $R

if [ -f st2_lagged_ckpt.npz ]; then
  gate
  ST_RESUME=1 ST_CKPT=st2_lagged_ckpt.npz ST_CONVECTION=lagged \
    ST_NEWTON_RTOL=1.0e-2 ST_LINEAR_RTOL=1.0e-1 \
    ST_PRESSURE_RTOL=3.0e-4 ST_CORRECTION_RTOL=1.0e-4 \
    ST_OUT=$R/stage2_pc_guard.npz SHED_CHUNK=10 \
    timeout 7200 python scripts/schafer_turek.py 1600 0.03 2 2.5e-3 \
    > $R/stage2_pc_guard.log 2>&1
  tail -6 $R/stage2_pc_guard.log
fi

gate
BENCH_PRESSURE_RTOL=3.0e-4 BENCH_CORRECTION_RTOL=1.0e-4 \
  BENCH_REFINES=3,5 BENCH_SIZE_TIMEOUT=2400 timeout 6000 python bench.py \
  > $R/bench_pc_35.json 2> $R/bench_pc_35.err
tail -1 $R/bench_pc_35.json

echo CHAIN9_DONE
