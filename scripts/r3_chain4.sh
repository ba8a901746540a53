#!/bin/bash
# Round-3 TPU campaign, chain 4 (after chain 3):
#   0) winmom/winkernel Mosaic re-probes at refine 3 and 5 — first on-chip
#      contact for the scoped-vmem fix (CompilerParams vmem_limit +
#      recompute-one-hots scatter); cheap, fail-fast
#   1) FLOW_WINKERNEL=1 full-step newton bench at 1.9M (the main perf
#      hypothesis: gather-free momentum matvecs at the size where the
#      gather bound dominates)
#   2) cavity3d jvp ladder (BASELINE configs[4] feasibility, displaced
#      from chain 2 by the wedged device grant)
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 60); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain4
mkdir -p $R

# 0) vmem-fix probes
gate
WM_REFINE=3 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r3.log 2>&1
tail -4 $R/winmom_r3.log
if grep -q "speedup" $R/winmom_r3.log; then
  gate
  WM_REFINE=5 timeout 1800 python scripts/winmom_bench.py \
    > $R/winmom_r5.log 2>&1
  tail -4 $R/winmom_r5.log
  gate
  WK_REFINE=5 timeout 1800 python scripts/winkernel_bench.py \
    > $R/winkernel_r5.log 2>&1
  tail -4 $R/winkernel_r5.log
fi

# 1) winkernel full-step benches at scale (chain 3 covered 120k only):
# the newton window tangent at 1.9M is the main perf hypothesis
gate
FLOW_WINKERNEL=1 BENCH_REFINES=5 BENCH_SIZE_TIMEOUT=2400 timeout 3600 \
  python bench.py > $R/bench_newton_wk_r5.json 2> $R/bench_newton_wk_r5.err
tail -1 $R/bench_newton_wk_r5.json
# same-window einsum reference (chain 3's newton r5 timed out cold-cache)
gate
BENCH_REFINES=5 BENCH_SIZE_TIMEOUT=2400 timeout 3600 python bench.py \
  > $R/bench_newton_r5.json 2> $R/bench_newton_r5.err
tail -1 $R/bench_newton_r5.json

# 2) cavity3d ladder
for N in 32 48 64; do
  gate || continue
  BENCH_MODE=cavity3d BENCH_N=$N FLOW_TANGENT_MODE=jvp BENCH_STEPS=10 \
    timeout 3000 python bench.py \
    > $R/cavity3d_N$N.json 2> $R/cavity3d_N$N.err
  tail -1 $R/cavity3d_N$N.json
done

echo CHAIN4_DONE
