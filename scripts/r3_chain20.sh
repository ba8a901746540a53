#!/bin/bash
# Round-3 TPU campaign, chain 20 (value-ordered; runs after the bisect):
#  0) 10M FUSED attempt — the 7.6M fused point survived the watchdog at
#     ~41 s/step and chain-17 measured granular at ~3x cost; a surviving
#     fused 10M step jumps the headline ~3x. Cheap to try first.
#  1) 10M granular linfast km=10 — direct A/B vs chain-17's 0.008
#     (same config, generic sweeps): isolates the linfast gain.
#  2) 10M granular linfast km=40 — long segments amortize the
#     per-execution dispatch floor (fewer, bigger executions).
#  3) 10M granular linfast km=40 + warm start (FLOW_MOM_WARMSTART=1).
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain20
mkdir -p $R

# 0) 10M FUSED attempt under adopted defaults (no BENCH_GRANULAR)
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5000 timeout 5400 python bench.py \
  > $R/b10m_fused.json 2> $R/b10m_fused.err
tail -1 $R/b10m_fused.json

run10m() { # run10m <tag> [env...]
  local tag=$1; shift
  gate
  env "$@" BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
    FLOW_TANGENT_MODE=jvp BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=7000 \
    timeout 7400 python bench.py > $R/$tag.json 2> $R/$tag.err
  tail -1 $R/$tag.json
}

run10m b10m_lf_km10 BENCH_KRY_MAXITER=10
run10m b10m_lf_km40 BENCH_KRY_MAXITER=40
run10m b10m_lf_km40_ws BENCH_KRY_MAXITER=40 FLOW_MOM_WARMSTART=1

echo CHAIN20_DONE
