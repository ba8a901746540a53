#!/bin/bash
# Round-3 TPU campaign, chain 4: the cavity3d jvp ladder displaced from
# chain 2 (the chain-2 run died against a wedged device grant after the
# 10M timeout kill).
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 60); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain4
mkdir -p $R

# winkernel full-step benches at scale (chain 3 covers 120k only): the
# newton window tangent at 1.9M is the main perf hypothesis
gate
FLOW_WINKERNEL=1 BENCH_REFINES=5 timeout 3600 python bench.py \
  > $R/bench_newton_wk_r5.json 2> $R/bench_newton_wk_r5.err
tail -1 $R/bench_newton_wk_r5.json

for N in 32 48 64 96; do
  gate || continue
  BENCH_MODE=cavity3d BENCH_N=$N FLOW_TANGENT_MODE=jvp BENCH_STEPS=10 \
    timeout 3000 python bench.py \
    > $R/cavity3d_N$N.json 2> $R/cavity3d_N$N.err
  tail -1 $R/cavity3d_N$N.json
done

echo CHAIN4_DONE
