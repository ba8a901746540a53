#!/bin/bash
# Stage-3 Schafer-Turek shedding campaign at refine-3 (~590k DoF): the
# mesh-convergence point above the validated stage-2 result. Seeds from
# the stage-2 SATURATED limit-cycle checkpoint prolonged one level up the
# refine_uniform hierarchy (fem/transfer.py), so only a short transient
# (~2-3 periods) is needed before the measurement window — the Hopf mode
# is already at finite amplitude.
#
# Same configuration as the validated stage-2 run: BDF2 rotational,
# increment-form solves at production tolerances, CFL-capped dt.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 30); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

STEPS=${STEPS:-3000}
DT=${DT:-2.0e-3}

gate
ST_CKPT=st3_ckpt.npz ST_SEED_CKPT=st2_stage2_ckpt.npz ST_SEED_REFINE=2 \
  SHED_CHUNK=${SHED_CHUNK:-5} \
  timeout 28800 python scripts/schafer_turek.py $STEPS 0.03 3 $DT \
  2>&1 | tail -14
cp -f schafer_turek.npz schafer_turek_stage3.npz
echo SHED_STAGE3_DONE
