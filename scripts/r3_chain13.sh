#!/bin/bash
# Round-3 TPU campaign, chain 13 (after chain 12): GMRES-default guard +
# adoption measurements, contingent on chain-11's r5 A/B being positive.
#   1) stage-2 limit-cycle guard ENTIRELY under the GMRES candidate
#      (lagged + aggressive pair + FLOW_MOM_SOLVER=gmres) — solver choice
#      at loose stopping changes the iterate path, so the same physics
#      certification as every other calibrated default applies
#   2) if BOTH pc-stopping rechecks (chain-11) were positive, the combined
#      bench config gets its own final series
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain13
mkdir -p $R

# 1) stage-2 guard under the GMRES candidate (seeded from the chain-10
#    regenerated stage-1; settled half must reproduce St 0.3001 /
#    Cd_max ~3.250 / Cl ~0.99)
if [ -f st1_r3.npz ]; then
  gate
  ST_SEED_CKPT=st1_r3.npz ST_SEED_REFINE=1 ST_CONVECTION=lagged \
    ST_NEWTON_RTOL=1.0e-2 ST_LINEAR_RTOL=1.0e-1 \
    FLOW_MOM_SOLVER=gmres \
    ST_CKPT=st2_gmres_ckpt.npz ST_OUT=$R/stage2_gmres_guard.npz SHED_CHUNK=10 \
    timeout 10800 python scripts/schafer_turek.py 3200 0.03 2 2.5e-3 \
    > $R/stage2_gmres_guard.log 2>&1
  tail -6 $R/stage2_gmres_guard.log
fi

echo CHAIN13_DONE
