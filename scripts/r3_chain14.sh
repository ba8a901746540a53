#!/bin/bash
# Round-3 TPU campaign, chain 14 (after chain 13): the 10M-DoF north-star
# point under the full calibrated candidate set (lagged + aggressive pair
# + GMRES momentum + pc-stopping) — chain-8's 0.006 steps/s ran BiCGStab
# with production pc-stopping.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain14
mkdir -p $R

gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp BENCH_CONVECTION=lagged FLOW_MOM_SOLVER=gmres \
  BENCH_PRESSURE_RTOL=3.0e-4 BENCH_CORRECTION_RTOL=1.0e-4 \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5400 timeout 7200 python bench.py \
  > $R/bench_10m_full.json 2> $R/bench_10m_full.err
tail -1 $R/bench_10m_full.json

echo CHAIN14_DONE
