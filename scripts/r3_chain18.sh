#!/bin/bash
# Round-3 TPU campaign, chain 18: bfloat16 bandwidth arms.
# Both candidates attack the measured HBM-bandwidth bound directly:
#  - FLOW_EMA_PREC=bf16: momentum tangent operator (scalar element tensor
#    + gathered Krylov vectors) in bf16, f32 residuals. Fused-path
#    solutions shift at operator-perturbation level (< the guarded bench
#    stopping); granular (>=3M) paths defect-correct to the f32 fixed
#    point (tests/test_ema.py).
#  - FLOW_MG_PREC=bf16: pressure V-cycle level operators in bf16 —
#    preconditioner-side only, cannot move the solution; CPU probe showed
#    16->19 pressure iters at DEEP rtol (bench stopping is looser).
# Back-to-back base arms for device-variance fairness.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain18
mkdir -p $R

run() { # run <tag> <timeout> [env...]
  local tag=$1 to=$2; shift 2
  gate
  env "$@" timeout "$to" python bench.py > $R/$tag.json 2> $R/$tag.err
  tail -1 $R/$tag.json
}

# stage 0: 7.6M FUSED under adopted defaults — chain-17 stage 1 measured
# the granular arm at 0.008 steps/s vs the r3_perf fused point's 0.027:
# granular segmentation overhead dominates at this size, so the honest
# candidate-set comparison at 7.6M is the fused mode (it fit before)
gate
BENCH_LCAR=0.02 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5000 timeout 5400 python bench.py \
  > $R/b76m_fused.json 2> $R/b76m_fused.err
tail -1 $R/b76m_fused.json

# stage 1: 120k ladder — base, ema-bf16, mg-bf16, gmres-basis-bf16, all
run b120k_base    2400 BENCH_REFINES=3
run b120k_emabf16 2400 BENCH_REFINES=3 FLOW_EMA_PREC=bf16
run b120k_mgbf16  2400 BENCH_REFINES=3 FLOW_MG_PREC=bf16
run b120k_gb16    2400 BENCH_REFINES=3 FLOW_GMRES_BASIS=bf16
run b120k_all     2400 BENCH_REFINES=3 FLOW_EMA_PREC=bf16 FLOW_MG_PREC=bf16 FLOW_GMRES_BASIS=bf16

# stage 2: 1.9M ladder — same five arms
run b19m_base    3600 BENCH_REFINES=5
run b19m_emabf16 3600 BENCH_REFINES=5 FLOW_EMA_PREC=bf16
run b19m_mgbf16  3600 BENCH_REFINES=5 FLOW_MG_PREC=bf16
run b19m_gb16    3600 BENCH_REFINES=5 FLOW_GMRES_BASIS=bf16
run b19m_all     3600 BENCH_REFINES=5 FLOW_EMA_PREC=bf16 FLOW_MG_PREC=bf16 FLOW_GMRES_BASIS=bf16

# stage 3: cavity3d N=32 combined arm (3-D dense path)
run c3d32_base 3000 BENCH_MODE=cavity3d BENCH_N=32 BENCH_STEPS=10
run c3d32_all  3000 BENCH_MODE=cavity3d BENCH_N=32 BENCH_STEPS=10 FLOW_EMA_PREC=bf16 FLOW_MG_PREC=bf16 FLOW_GMRES_BASIS=bf16

echo CHAIN18_DONE
