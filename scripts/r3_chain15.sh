#!/bin/bash
# Round-3 TPU campaign, chain 15: clean rerun of the 10M-DoF point under
# the full adopted candidate set (chain-14's timed pass carried one 692 s
# device-stall outlier on work identical to a 155 s step; warm cache now).
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain15
mkdir -p $R

gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=4500 timeout 5400 python bench.py \
  > $R/bench_10m_rerun.json 2> $R/bench_10m_rerun.err
tail -1 $R/bench_10m_rerun.json

echo CHAIN15_DONE
