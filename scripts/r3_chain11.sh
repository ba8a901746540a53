#!/bin/bash
# Round-3 TPU campaign, chain 11 (after chain 10):
#   0) GMRES momentum-solver A/B (FLOW_MOM_SOLVER=gmres) at 120k/1.9M —
#      CPU matvec counts say 13-15 GMRES vs 16-18 BiCGStab per solve
#   1) 120k candidate-pc solo recheck (chain-10's 6.456 ran contended
#      with a full CPU pytest suite; baseline 6.877)
#   2) combined candidate: pc-stopping + gmres at 120k/1.9M
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain11
mkdir -p $R

# 0) GMRES A/B (production pc-stopping so the arm isolates the solver)
gate
FLOW_MOM_SOLVER=gmres BENCH_REFINES=3,5 BENCH_SIZE_TIMEOUT=2400 \
  timeout 6000 python bench.py \
  > $R/bench_gmres_35.json 2> $R/bench_gmres_35.err
tail -1 $R/bench_gmres_35.json

# 1) candidate-pc 120k solo recheck
gate
BENCH_PRESSURE_RTOL=3.0e-4 BENCH_CORRECTION_RTOL=1.0e-4 BENCH_REFINES=3 \
  timeout 2400 python bench.py \
  > $R/bench_pc_3_solo.json 2> $R/bench_pc_3_solo.err
tail -1 $R/bench_pc_3_solo.json

# 2) combined candidate (pc + gmres)
gate
FLOW_MOM_SOLVER=gmres BENCH_PRESSURE_RTOL=3.0e-4 BENCH_CORRECTION_RTOL=1.0e-4 \
  BENCH_REFINES=3,5 BENCH_SIZE_TIMEOUT=2400 timeout 6000 python bench.py \
  > $R/bench_pcgmres_35.json 2> $R/bench_pcgmres_35.err
tail -1 $R/bench_pcgmres_35.json

# 3) cavity3d N=64 (6.7M DoF 3-D): chain-8 ran 7/10 steps at ~0.01
#    steps/s then hit its 3600 s bound; chain-10's inserted step was
#    skipped by the already-running bash — record the point with 4 steps
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 FLOW_TANGENT_MODE=jvp \
  FLOW_CELL_CHUNK=131072 BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5400 \
  timeout 6600 python bench.py \
  > $R/cavity3d_N64_s4.json 2> $R/cavity3d_N64_s4.err
tail -1 $R/cavity3d_N64_s4.json

echo CHAIN11_DONE
