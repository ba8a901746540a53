#!/bin/bash
# Round-3 TPU campaign, chain 16:
#  1. clean 10M-DoF rerun under the adopted candidate set (chain-14's timed
#     pass carried one 692 s device-stall outlier on work identical to a
#     155 s step; warm cache now) — was chain-15
#  2-3. element-matrix-apply (FLOW_LAGGED_EMA=1) A/B at 120k and 1.9M:
#     exact operator swap (tests/test_ema.py pins vs jax.linearize), so no
#     physics guard is needed — wall-clock decides adoption
#  4. cavity3d N=32 EMA arm (3-D dense path, 860k DoF)
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain16
mkdir -p $R

# stage 1: 10M clean rerun (headline for BENCH_LARGE.json)
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 BENCH_GRANULAR=1 \
  FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=4500 timeout 5400 python bench.py \
  > $R/bench_10m_rerun.json 2> $R/bench_10m_rerun.err
tail -1 $R/bench_10m_rerun.json

# stage 2: 120k A/B (baseline first, EMA second, back-to-back)
gate
BENCH_REFINES=3 timeout 2400 python bench.py \
  > $R/b120k_base.json 2> $R/b120k_base.err
tail -1 $R/b120k_base.json
gate
FLOW_LAGGED_EMA=1 BENCH_REFINES=3 timeout 2400 python bench.py \
  > $R/b120k_ema.json 2> $R/b120k_ema.err
tail -1 $R/b120k_ema.json

# stage 3: 1.9M A/B
gate
BENCH_REFINES=5 timeout 3600 python bench.py \
  > $R/b19m_base.json 2> $R/b19m_base.err
tail -1 $R/b19m_base.json
gate
FLOW_LAGGED_EMA=1 BENCH_REFINES=5 timeout 3600 python bench.py \
  > $R/b19m_ema.json 2> $R/b19m_ema.err
tail -1 $R/b19m_ema.json

# stage 4: cavity3d N=32 A/B (fused dense 3-D path)
gate
BENCH_MODE=cavity3d BENCH_N=32 BENCH_STEPS=10 timeout 3000 python bench.py \
  > $R/c3d32_base.json 2> $R/c3d32_base.err
tail -1 $R/c3d32_base.json
gate
FLOW_LAGGED_EMA=1 BENCH_MODE=cavity3d BENCH_N=32 BENCH_STEPS=10 \
  timeout 3000 python bench.py \
  > $R/c3d32_ema.json 2> $R/c3d32_ema.err
tail -1 $R/c3d32_ema.json

echo CHAIN16_DONE
