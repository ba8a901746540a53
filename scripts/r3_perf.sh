#!/bin/bash
# Round-3 TPU performance campaign (run serially after the stability work):
#   1) packed-layout A/B at 120k/1.9M (BENCH_PACKED=0 vs default)
#   2) vertex momentum-preconditioner A/B at 120k
#   3) 7.6M-DoF point (packed + hoisted + granular-if-needed)
#   4) ~10M-DoF point (lcar 0.0175 refine 6)
#   5) f64-on-TPU policy table (scripts/f64_policy.py)
#   6) cavity3d single-chip ladder (BASELINE configs[4] feasibility)
# Each stage is its own bench.py invocation (subprocess isolation inside).
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 20); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3_perf
mkdir -p $R

# 1a) default (packed) series 120k + 1.9M
gate
timeout 3600 python bench.py > $R/bench_packed.json 2> $R/bench_packed.err
tail -1 $R/bench_packed.json

# 1b) einsum path A/B
gate
BENCH_PACKED=0 BENCH_REFINES=3,5 timeout 3600 python bench.py \
  > $R/bench_einsum.json 2> $R/bench_einsum.err
tail -1 $R/bench_einsum.json

# 2) vertex momentum preconditioner A/B (120k only, quick)
gate
BENCH_MOMENTUM_PRECOND=vertex BENCH_REFINES=3 timeout 1800 python bench.py \
  > $R/bench_vertex.json 2> $R/bench_vertex.err
tail -1 $R/bench_vertex.json

# 3) 7.6M DoF (refine-6)
gate
BENCH_REFINES=6 BENCH_STEPS=10 BENCH_SIZE_TIMEOUT=3300 timeout 3600 \
  python bench.py > $R/bench_7p6m.json 2> $R/bench_7p6m.err
tail -1 $R/bench_7p6m.json

# 4) ~10M DoF (lcar 0.0175, refine-6)
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_STEPS=10 BENCH_SIZE_TIMEOUT=3300 \
  timeout 3600 python bench.py > $R/bench_10m.json 2> $R/bench_10m.err
tail -1 $R/bench_10m.json

# 5) f64 policy
gate
timeout 2400 python scripts/f64_policy.py > $R/f64_policy.log 2>&1
tail -10 $R/f64_policy.log

# 6) cavity3d ladder
for N in 48 64 96 128; do
  gate
  BENCH_MODE=cavity3d BENCH_N=$N BENCH_STEPS=10 timeout 1800 \
    python bench.py > $R/cavity3d_$N.json 2> $R/cavity3d_$N.err
  tail -1 $R/cavity3d_$N.json
done

echo R3_PERF_DONE
