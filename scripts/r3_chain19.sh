#!/bin/bash
# Round-3 TPU campaign, chain 19 (after chain 18):
#  0) 10M FUSED attempt — the 7.6M fused point (0.027, 37 s/step)
#     survived the tunnel watchdog, and chain-17 showed granular costs
#     ~3x at these sizes; if a fused 10M step (~45-60 s) survives too,
#     the headline jumps ~3x. Cheap to try; failure tells us which
#     limit (watchdog / HBM / compile) actually binds at 10M.
#  1) stage-2 limit-cycle guard under the FULL bf16 candidate set
#     (certifies fused bf16-EMA adoption; covers the single arms)
#  2) 10M-DoF granular point under the bf16 arms
#  3) cavity3d N=64 retry with the chunked EMA build (chain-17 OOM fix)
# Edit CHAIN19_ARMS before launch if chain-18 rejected any arm.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain19
mkdir -p $R

ARMS="${CHAIN19_ARMS:-FLOW_EMA_PREC=bf16 FLOW_MG_PREC=bf16 FLOW_GMRES_BASIS=bf16}"

# 0) 10M FUSED attempt under adopted defaults (no BENCH_GRANULAR)
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5000 timeout 5400 python bench.py \
  > $R/b10m_fused.json 2> $R/b10m_fused.err
tail -1 $R/b10m_fused.json

# 0.5) granular dispatch profile at 7.6M: decompose the ~3x granular
#      tax (fixed per-execution tunnel cost vs compute)
gate
BENCH_LCAR=0.02 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  timeout 3600 python scripts/gran_profile.py \
  > $R/gran_profile.json 2> $R/gran_profile.err
tail -1 $R/gran_profile.json

# 1) stage-2 guard under the bf16 candidate set
if [ -f st1_r3.npz ]; then
  gate
  env $ARMS \
    ST_SEED_CKPT=st1_r3.npz ST_SEED_REFINE=1 ST_CONVECTION=lagged \
    ST_NEWTON_RTOL=1.0e-2 ST_LINEAR_RTOL=1.0e-1 \
    FLOW_MOM_SOLVER=gmres \
    ST_CKPT=st2_bf16_ckpt.npz ST_OUT=$R/stage2_bf16_guard.npz SHED_CHUNK=10 \
    timeout 10800 python scripts/schafer_turek.py 3200 0.03 2 2.5e-3 \
    > $R/stage2_bf16_guard.log 2>&1
  tail -6 $R/stage2_bf16_guard.log
fi

# 2) 10M granular point under the bf16 arms
gate
env $ARMS \
  BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=4500 timeout 5400 python bench.py \
  > $R/b10m_bf16.json 2> $R/b10m_bf16.err
tail -1 $R/b10m_bf16.json

# 3) cavity3d N=64 retry with the chunked EMA build
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  BENCH_SIZE_TIMEOUT=4200 timeout 5400 python bench.py \
  > $R/c3d64_retry.json 2> $R/c3d64_retry.err
tail -1 $R/c3d64_retry.json

echo CHAIN19_DONE

echo CHAIN19_ALL_DONE
