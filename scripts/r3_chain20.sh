#!/bin/bash
# Round-3 TPU campaign, chain 20: the granular lagged-linear fast path
# (FLOW_GRAN_LINFAST, default on) at the huge sizes.
#
# What changed: with lagged convection the momentum residual is affine,
# so the granular "Newton" sweeps are segments of ONE linear solve. The
# fast path builds the EMA scalar tensor + the true initial residual in
# one setup execution and each segment then runs kry_maxiter Krylov
# iterations plus ONE algebraic residual update (r1 = r + J dx) — the
# generic sweeps paid a full quadrature EMA rebuild + TWO quadrature
# residual evaluations per segment. At chain-17's 10M telemetry
# (newton 3-4 segments/step) that removes ~3-4 EMA builds and ~6-8
# full-mesh quadrature passes per step.
#
# Ladder:
#  1) 10M granular, linfast, kry_maxiter 10 (direct A/B vs chain-17's
#     0.008 which used the generic sweeps at km=10)
#  2) 10M granular, linfast, km=20 and km=40 — fewer, longer segments
#     amortize the per-execution dispatch floor (gran_profile chain-19
#     quantifies the floor); bounded by the ~10 s tunnel watchdog
#  3) 7.6M granular best-km — head-to-head vs the chain-18 FUSED 0.024
#     (chain-17 generic granular was 0.008: a 3x tax; how much does
#     linfast + km recover?)
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

run10m() { # run10m <tag> [env...]
  local tag=$1; shift
  gate
  env "$@" BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
    FLOW_TANGENT_MODE=jvp BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=7000 \
    timeout 7400 python bench.py > $R/$tag.json 2> $R/$tag.err
  tail -1 $R/$tag.json
}

run10m b10m_lf_km10 BENCH_KRY_MAXITER=10
run10m b10m_lf_km20 BENCH_KRY_MAXITER=20
run10m b10m_lf_km40 BENCH_KRY_MAXITER=40

# warm start (FLOW_MOM_WARMSTART=1): previous step's increment seeds the
# solve; stopping target unchanged (physics-neutral, tests/test_ema.py)
run10m b10m_lf_km20_ws BENCH_KRY_MAXITER=20 FLOW_MOM_WARMSTART=1

# 7.6M granular with linfast at km=20 (vs chain-18 fused 0.024 and the
# chain-17 generic-granular 0.008)
gate
BENCH_LCAR=0.02 BENCH_REFINES=6 BENCH_GRANULAR=1 BENCH_KRY_MAXITER=20 \
  FLOW_TANGENT_MODE=jvp BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5000 \
  timeout 5400 python bench.py > $R/b76m_lf_km20.json 2> $R/b76m_lf_km20.err
tail -1 $R/b76m_lf_km20.json

echo CHAIN20_DONE
