#!/bin/bash
# Round-3 TPU campaign, chain 19b (trimmed from r3_chain19.sh after the
# chain-18 verdicts): the bf16 arms measured negative-or-neutral at
# 120k/1.9M, so the bf16 physics guard and the bf16 10M point are
# dropped. What remains:
#  0) 10M FUSED attempt — the 7.6M fused point survived the watchdog at
#     ~41 s/step; if a fused 10M step survives too, the headline jumps
#     ~3x over the granular 0.008.
#  1) granular dispatch profile at 7.6M (scripts/gran_profile.py):
#     decompose the per-execution cost (noop floor / matvec / sweep /
#     pressure / correction) — decides how much chain-20's km ladder
#     can recover.
#  2) cavity3d N=64 (6.7M DoF 3-D) retry under the chunked EMA build
#     (chain-17 OOM fix) + granular linfast.
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

# 0) 10M FUSED attempt under adopted defaults (no BENCH_GRANULAR)
gate
BENCH_LCAR=0.0175 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  BENCH_STEPS=4 BENCH_SIZE_TIMEOUT=5000 timeout 5400 python bench.py \
  > $R/b10m_fused.json 2> $R/b10m_fused.err
tail -1 $R/b10m_fused.json

# 1) granular dispatch profile at 7.6M
gate
BENCH_LCAR=0.02 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  timeout 3600 python scripts/gran_profile.py \
  > $R/gran_profile.json 2> $R/gran_profile.err
tail -1 $R/gran_profile.json

# 2) cavity3d N=64 retry (chunked EMA + granular linfast)
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  BENCH_SIZE_TIMEOUT=4200 timeout 5400 python bench.py \
  > $R/c3d64_retry.json 2> $R/c3d64_retry.err
tail -1 $R/c3d64_retry.json

echo CHAIN19B_DONE
