#!/bin/bash
# Round-3 TPU campaign, chain 10 (after chain 8; replaces chain 9's
# resume-based plan — the saturated checkpoints st1_r3.npz /
# st2_lagged_ckpt.npz were lost to the 2026-08-19 machine swap):
#   1) stage-1 seed regeneration (37k DoF, production tolerances, BDF2)
#   2) stage-2 guard for the chain-9 CANDIDATE pressure/correction
#      stopping (pressure 3e-4, correction 1e-4) — the full 148k-DoF
#      limit cycle developed END-TO-END under lagged + aggressive pair +
#      candidate knobs (stronger than chain-9's 1600-step resume guard);
#      settled half must reproduce St 0.3001 / Cd_max ~3.250 / Cl ~0.99
#   3) 120k + 1.9M bench points with the candidate knobs
#   4) winmom runtime-fault bisect (refine-5 S=256, refine-4 vmem=32M)
#      — chain-6/7 phase-F logs were lost with /tmp twice
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain10
mkdir -p $R

# 0) assembled-ELL lagged momentum A/B (new this chain): exactness is
#    CPU-pinned (test_lagged_ell_*), so this is wall-clock only. The
#    baseline arm is chain-6/7's committed numbers under identical knobs
#    (120k 6.877, 1.9M 0.296 steps/s); only the ELL=1 arm runs.
gate
FLOW_LAGGED_ELL=1 BENCH_REFINES=3,5 BENCH_SIZE_TIMEOUT=2400 \
  timeout 6000 python bench.py \
  > $R/bench_lagell_35.json 2> $R/bench_lagell_35.err
tail -1 $R/bench_lagell_35.json

# 1) stage-1 seed (cold perturbation -> saturated limit cycle, ~20 s phys)
if [ ! -f st1_r3.npz ]; then
  gate
  ST_CKPT=st1_r3.npz ST_OUT=$R/stage1_regen.npz SHED_CHUNK=25 \
    timeout 7200 python scripts/schafer_turek.py 5000 0.03 1 4.0e-3 \
    > $R/stage1_regen.log 2>&1
  tail -6 $R/stage1_regen.log
fi

# 2) stage-2 candidate-knob guard: prolong stage-1 to refine-2, develop
#    3200 steps (8 s, ~24 periods) ENTIRELY under the candidate config
if [ -f st1_r3.npz ]; then
  gate
  ST_SEED_CKPT=st1_r3.npz ST_SEED_REFINE=1 ST_CONVECTION=lagged \
    ST_NEWTON_RTOL=1.0e-2 ST_LINEAR_RTOL=1.0e-1 \
    ST_PRESSURE_RTOL=3.0e-4 ST_CORRECTION_RTOL=1.0e-4 \
    ST_CKPT=st2_pc_ckpt.npz ST_OUT=$R/stage2_pc_guard.npz SHED_CHUNK=10 \
    timeout 10800 python scripts/schafer_turek.py 3200 0.03 2 2.5e-3 \
    > $R/stage2_pc_guard.log 2>&1
  tail -6 $R/stage2_pc_guard.log
fi

# 3) bench points with the candidate knobs
gate
BENCH_PRESSURE_RTOL=3.0e-4 BENCH_CORRECTION_RTOL=1.0e-4 \
  BENCH_REFINES=3,5 BENCH_SIZE_TIMEOUT=2400 timeout 6000 python bench.py \
  > $R/bench_pc_35.json 2> $R/bench_pc_35.err
tail -1 $R/bench_pc_35.json

# 3b) cavity3d N=64 (6.7M DoF 3-D): chain-8 ran 7/10 steps at ~0.01
#     steps/s then hit its 3600 s bound — rerun with 4 measured steps
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 FLOW_TANGENT_MODE=jvp \
  FLOW_CELL_CHUNK=131072 BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5400 \
  timeout 6600 python bench.py \
  > $R/cavity3d_N64_s4.json 2> $R/cavity3d_N64_s4.err
tail -1 $R/cavity3d_N64_s4.json

# 4) winmom bisect: refine-5 smaller windows, refine-4 reduced vmem
gate
WM_REFINE=5 WM_S=256 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r5_s256.log 2>&1
tail -4 $R/winmom_r5_s256.log
gate
WM_REFINE=4 FLOW_VMEM_LIMIT_MB=32 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r4_v32.log 2>&1
tail -4 $R/winmom_r4_v32.log

echo CHAIN10_DONE
