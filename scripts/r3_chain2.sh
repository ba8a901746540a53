#!/bin/bash
# Round-3 TPU campaign, chain 2 (queued items from ROADMAP.md):
#   1) lagged-convection A/B at 120k/1.9M (the throughput recovery lever
#      for the increment-form iteration regression)
#   2) lagged + FLOW_WINKERNEL full-step bench at 120k (gather-free
#      momentum/correction/pressure matvecs)
#   3) winmom/winkernel matvec microbenches (Pallas window kernels vs
#      quadrature path) at refine 3 and 5
#   4) f64-on-TPU policy matrix (scripts/f64_policy.py)
#   5) ~10M-DoF retry: granular + jvp tangent mode (chain11)
#   6) cavity3d single-chip ladder under jvp tangent mode (chain12)
# Serial; each stage gated on a fresh-process device probe.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 30); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain2
mkdir -p $R

# 1) lagged convection A/B
gate
BENCH_CONVECTION=lagged timeout 3600 python bench.py \
  > $R/bench_lagged.json 2> $R/bench_lagged.err
tail -1 $R/bench_lagged.json

# 2) lagged + window kernels, 120k first (cold Pallas compiles)
gate
BENCH_CONVECTION=lagged FLOW_WINKERNEL=1 BENCH_REFINES=3 timeout 3600 \
  python bench.py > $R/bench_lagged_wk.json 2> $R/bench_lagged_wk.err
tail -1 $R/bench_lagged_wk.json

# 3) window-kernel matvec microbenches
gate
WM_REFINE=3 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r3.log 2>&1
tail -6 $R/winmom_r3.log
gate
WM_REFINE=5 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r5.log 2>&1
tail -6 $R/winmom_r5.log
gate
WK_REFINE=3 timeout 1800 python scripts/winkernel_bench.py \
  > $R/winkernel_r3.log 2>&1
tail -6 $R/winkernel_r3.log
gate
WK_REFINE=5 timeout 1800 python scripts/winkernel_bench.py \
  > $R/winkernel_r5.log 2>&1
tail -6 $R/winkernel_r5.log

# 4) f64 policy matrix
gate
timeout 2400 python scripts/f64_policy.py > $R/f64_policy.log 2>&1
tail -15 $R/f64_policy.log

# 5) ~10M-DoF retry in granular + jvp mode
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=10 BENCH_SIZE_TIMEOUT=5400 timeout 5700 \
  python bench.py > $R/bench_10m.json 2> $R/bench_10m.err
tail -1 $R/bench_10m.json

# 6) cavity3d ladder under jvp
for N in 32 48 64 96; do
  gate
  BENCH_MODE=cavity3d BENCH_N=$N FLOW_TANGENT_MODE=jvp BENCH_STEPS=10 \
    timeout 3000 python bench.py \
    > $R/cavity3d_N$N.json 2> $R/cavity3d_N$N.err
  tail -1 $R/cavity3d_N$N.json
done

echo CHAIN2_DONE
