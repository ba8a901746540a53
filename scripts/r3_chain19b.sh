#!/bin/bash
# Round-3 TPU campaign, chain 19b (tail; runs after chain-20):
#  0) cavity3d N=64 (6.7M DoF 3-D) retry under the chunked EMA build
#     (chain-17 OOM fix) + granular linfast.
#  1) granular dispatch profile at 7.6M (scripts/gran_profile.py):
#     decompose the per-execution cost (noop floor / matvec / sweep /
#     pressure / correction).
# The bf16 arms were dropped: chain-18 measured EMA bf16 -9%@120k
# (-18% in a polluted window), GMRES-basis bf16 -9%@120k, and MG bf16
# crashed the TPU worker at 1.9M on both attempts.
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

# 0) cavity3d N=64 retry (chunked EMA + granular linfast)
gate
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  BENCH_SIZE_TIMEOUT=4200 timeout 5400 python bench.py \
  > $R/c3d64_retry.json 2> $R/c3d64_retry.err
tail -1 $R/c3d64_retry.json

# 1) granular dispatch profile at 7.6M
gate
BENCH_LCAR=0.02 BENCH_REFINES=6 FLOW_TANGENT_MODE=jvp \
  timeout 3600 python scripts/gran_profile.py \
  > $R/gran_profile.json 2> $R/gran_profile.err
tail -1 $R/gran_profile.json

# 2) cavity3d N=32 fused RE-MEASURE under the fixed value-readback sync
#    (the pre-fix path timed via block_until_ready, which the tunnel can
#    early-return on queued chains — c3d32_all read a bogus 48.6; the
#    ledger 0.520/0.587/0.588 points need an honest re-pin)
gate
BENCH_MODE=cavity3d BENCH_N=32 BENCH_STEPS=10 timeout 3000 python bench.py \
  > $R/c3d32_repin.json 2> $R/c3d32_repin.err
tail -1 $R/c3d32_repin.json

echo CHAIN19B_DONE
