#!/bin/bash
# Round-3 TPU campaign, chain 17: refresh the large-size cached ladder
# under the FULL adopted default set (lagged + GMRES momentum +
# calibrated pc-stopping + element-matrix apply, now all defaults):
#  1. 7.6M karman (the cached 0.027 point predates every adopted lever)
#  2. 10M karman (chain-16 recorded 0.007 WITHOUT EMA; EMA measured
#     +6% at 1.9M and +13-15% elsewhere)
#  3. cavity3d N=64 (6.7M DoF 3-D; cached 0.009 predates GMRES/EMA)
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain17
mkdir -p $R

# stage 1: 7.6M under adopted defaults
gate
BENCH_LCAR=0.02 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=4200 timeout 5400 python bench.py \
  > $R/b76m.json 2> $R/b76m.err
tail -1 $R/b76m.json

# stage 2: 10M under adopted defaults (EMA now on)
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=4500 timeout 5400 python bench.py \
  > $R/b10m.json 2> $R/b10m.err
tail -1 $R/b10m.json

# stage 3: cavity3d N=64 under adopted defaults
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  BENCH_SIZE_TIMEOUT=4200 timeout 5400 python bench.py \
  > $R/c3d64.json 2> $R/c3d64.err
tail -1 $R/c3d64.json

echo CHAIN17_DONE
