#!/bin/bash
# Round-3 TPU campaign, chain 19 (after chain 18): physics guard for any
# ADOPTABLE bf16 arm + large-size points under the winning combination.
#   1) stage-2 limit-cycle guard under the FULL bf16 candidate set
#      (FLOW_EMA_PREC + FLOW_MG_PREC + FLOW_GMRES_BASIS all bf16):
#      the fused bf16-EMA arm shifts solutions at operator-perturbation
#      level, so it needs the same certification as every calibrated
#      default (settled half must reproduce St 0.3001 / Cd_max ~3.250 /
#      Cl ~0.99). Guarding the triple also covers each single arm.
#   2) 10M-DoF point under the chain-18 winners (granular mode).
# If a bf16 arm measured NEGATIVE in chain-18, skip adopting it; the
# guard still certifies whichever arms are positive (run them solo by
# editing the env below before launch).
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

# 2) 10M point under the winning arms (granular + jvp as in chain-16)
gate
env $ARMS \
  BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=4500 timeout 5400 python bench.py \
  > $R/b10m_bf16.json 2> $R/b10m_bf16.err
tail -1 $R/b10m_bf16.json

echo CHAIN19_DONE

# 3) cavity3d N=64 retry with the chunked EMA build (chain-17 OOM fix:
#    bench now defaults FLOW_CELL_CHUNK for N>=48 and the lagged
#    scalar-tensor build honors it)
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  BENCH_SIZE_TIMEOUT=4200 timeout 5400 python bench.py \
  > $R/c3d64_retry.json 2> $R/c3d64_retry.err
tail -1 $R/c3d64_retry.json

echo CHAIN19_ALL_DONE
