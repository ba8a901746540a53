#!/bin/bash
# Round-3 TPU campaign, chain 8 (after chain 7):
#   0) step decomposition profile at 1.9M (lagged + newton) — where do
#      the 3.4 s/step actually go (momentum applies / pressure MG /
#      correction / scan-body extras)
#   1) cavity3d chunked ladder: N=48/64 with FLOW_CELL_CHUNK bounding the
#      jvp quadrature temps (chain-6 OOM'd 17.8G at N=48 on the einsum
#      3-D path; the chunked volume evaluation is the designed fix —
#      geometry [nc,3,3] tile padding ~5.5G stays, temps go per-chunk)
#   2) 10M-DoF retry: packed granular (tile-friendly layout, the path
#      that executed 10M in chain 3) + LAGGED + the calibrated aggressive
#      stopping pair — the recorded 0.003 steps/s ran chain-3-era
#      tolerances (newton 3-4 x BiCGStab 19-40/step; lagged+aggressive
#      cuts the apply count ~6-10x)
#   3) 7.6M fused packed + lagged + aggressive (chain-6 newton measured
#      0.021; chain-3 packed-era 0.027)  [runs in chain 7 phase 4]
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain8
mkdir -p $R

# 0) step decomposition at 1.9M
gate
SP_REFINE=5 SP_CONVECTION=lagged SP_REPS=3 timeout 3600 \
  python scripts/step_profile.py > $R/profile_r5_lagged.log 2>&1
tail -12 $R/profile_r5_lagged.log
gate
SP_REFINE=5 SP_CONVECTION=newton SP_REPS=3 timeout 3600 \
  python scripts/step_profile.py > $R/profile_r5_newton.log 2>&1
tail -12 $R/profile_r5_newton.log

# 0b) component decomposition (gather / dof_sum / einsum chain split) —
#     the direct measurement behind the "row-count-bound" model, never
#     recorded at the bench sizes
gate
timeout 2400 python scripts/profile_hotpath.py 0.02 3 \
  > $R/hotpath_r3.log 2>&1
tail -14 $R/hotpath_r3.log
gate
timeout 3600 python scripts/profile_hotpath.py 0.02 5 \
  > $R/hotpath_r5.log 2>&1
tail -14 $R/hotpath_r5.log

# 1) cavity3d chunked ladder (granular + jvp + chunk)
for N in 48 64; do
  gate || continue
  BENCH_MODE=cavity3d BENCH_N=$N BENCH_GRANULAR=1 FLOW_TANGENT_MODE=jvp \
    FLOW_CELL_CHUNK=131072 BENCH_STEPS=10 \
    timeout 3600 python bench.py \
    > $R/cavity3d_N${N}_chunk.json 2> $R/cavity3d_N${N}_chunk.err
  tail -1 $R/cavity3d_N${N}_chunk.json
done

# 2) 10M-DoF retry: packed granular + lagged + aggressive pair
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp BENCH_CONVECTION=lagged \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5400 timeout 7200 python bench.py \
  > $R/bench_10m_lagged.json 2> $R/bench_10m_lagged.err
tail -1 $R/bench_10m_lagged.json

echo CHAIN8_DONE
