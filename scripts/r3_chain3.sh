#!/bin/bash
# Round-3 TPU campaign, chain 3 (after chain 2):
#   1) window-kernel Mosaic probes (reshape-free rewrite) r3, then r5
#   2) FLOW_WINKERNEL=1 + lagged full-step bench at 120k if probes pass
#   3) clean lagged-vs-newton A/B at refine 5, back-to-back (chain2's
#      lagged r5 point ran on a ~2x-degraded device: poisson_ms canary
#      952 vs 495 for the identical cached program)
#   4) f64-on-TPU policy matrix on axon (sealed/speed x x64 on/off)
#   5) stage-3 shedding campaign (refine-3, seeded from stage-2 limit
#      cycle) — the long job, last.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 30); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain3
mkdir -p $R

# 1) window-kernel probes
gate
WM_REFINE=3 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r3.log 2>&1
tail -5 $R/winmom_r3.log
gate
WK_REFINE=3 timeout 1800 python scripts/winkernel_bench.py \
  > $R/winkernel_r3.log 2>&1
tail -5 $R/winkernel_r3.log
if grep -q "speedup" $R/winmom_r3.log; then
  gate
  WM_REFINE=5 timeout 1800 python scripts/winmom_bench.py \
    > $R/winmom_r5.log 2>&1
  tail -5 $R/winmom_r5.log
  # 2) full-step bench with window kernels: newton (default scheme) and
  # lagged
  gate
  FLOW_WINKERNEL=1 BENCH_REFINES=3 timeout 3600 \
    python bench.py > $R/bench_newton_wk.json 2> $R/bench_newton_wk.err
  tail -1 $R/bench_newton_wk.json
  gate
  BENCH_CONVECTION=lagged FLOW_WINKERNEL=1 BENCH_REFINES=3 timeout 3600 \
    python bench.py > $R/bench_lagged_wk.json 2> $R/bench_lagged_wk.err
  tail -1 $R/bench_lagged_wk.json
fi

# 3) clean lagged-vs-newton A/B at refine 5, back-to-back
gate
BENCH_REFINES=5 timeout 2400 python bench.py \
  > $R/bench_newton_r5.json 2> $R/bench_newton_r5.err
tail -1 $R/bench_newton_r5.json
gate
BENCH_CONVECTION=lagged BENCH_REFINES=5 timeout 2400 python bench.py \
  > $R/bench_lagged_r5.json 2> $R/bench_lagged_r5.err
tail -1 $R/bench_lagged_r5.json

# 4) ~10M retry FIRST (the north-star headline — must not be starved by
# the long stage-3 job if the device dies again): granular+jvp is likely
# WORKING but silent and slow (the chain-2 attempt was killed at 5400 s
# with no output) — fewer steps, much bigger budget
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=10000 timeout 10500 \
  python bench.py > $R/bench_10m.json 2> $R/bench_10m.err
tail -1 $R/bench_10m.json
if ! grep -q '"cached_fallback": false' $R/bench_10m.json; then
  # fallback: window-kernel layout (tile-friendly tables, ~1.2x pad vs the
  # einsum intermediates' 20-60x) is the alternate 10M memory path
  gate
  FLOW_WINKERNEL=1 BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
    FLOW_TANGENT_MODE=jvp BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=10000 \
    timeout 10500 python bench.py \
    > $R/bench_10m_wk.json 2> $R/bench_10m_wk.err
  tail -1 $R/bench_10m_wk.json
fi

# 5) f64 policy matrix on the chip
for x64 in 0 1; do
  for probe in sealed speed; do
    gate
    F64P_PLATFORM=axon F64P_X64=$x64 timeout 2400 \
      python scripts/f64_policy.py $probe \
      > $R/f64_${probe}_x64${x64}.log 2>&1
    grep -a "sealed\|speed" $R/f64_${probe}_x64${x64}.log | tail -2
  done
done

# 6) stage-3 shedding campaign (the long job, last — accuracy polish on
# top of the already-validated stage-2 result)
bash scripts/shed_stage3.sh > $R/shed_stage3.log 2>&1
tail -14 $R/shed_stage3.log

echo CHAIN3_DONE
