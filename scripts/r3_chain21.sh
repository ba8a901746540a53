#!/bin/bash
# Round-3 TPU campaign, chain 21 (session 13) — complete the 3-D ladder
# (BASELINE configs[4]) under the fixed value-readback sync:
#  0) cavity3d N=32 FUSED re-pin: the ledger 0.520/0.587/0.588 points
#     were timed through block_until_ready, which the tunnel can
#     early-return on queued chains (chain-18 bench bug). Honest re-pin.
#  1) cavity3d N=48 FUSED attempt: never tried since FLOW_CELL_CHUNK
#     defaulted on for N>=48 (the einsum-path OOM fix) + the chunked EMA
#     build landed. If it fits, it should beat the granular 0.014 by the
#     measured ~3-4x fused/granular ratio.
#  2) cavity3d N=48 granular re-pin (fallback datum; trustworthy timing
#     but measured pre-EMA-adoption).
#  3) cavity3d N=64 granular with EMA+linfast OFF (bench.py now defaults
#     FLOW_LAGGED_EMA=0 FLOW_GRAN_LINFAST=0 at N>=64): the chain-19b OOM
#     was the persistent EMA scalar tensor at compile (24.0G vs 15.75G);
#     matvec-by-quadrature keeps only chunk-bounded temps.
#  4) cavity3d N=64 FUSED attempt with the same EMA-off fallback
#     (stretch: pre-chunk fused N=64 OOM'd at 41.6G on jvp quadrature
#     temps; the chunk bounds those now).
set -x
cd "$(dirname "$0")/.."

# pid file for the retry tail (scripts/r3_chain21_retry.sh waits on it)
echo $$ > /tmp/chain21.pid
trap 'rm -f /tmp/chain21.pid' EXIT

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain21
mkdir -p $R

# 0) N=32 fused re-pin
gate || { echo GATE_FAILED; echo CHAIN21_DONE; exit 1; }
BENCH_MODE=cavity3d BENCH_N=32 BENCH_STEPS=10 timeout 2400 python bench.py \
  > $R/c3d32_repin.json 2> $R/c3d32_repin.err
tail -1 $R/c3d32_repin.json

# 1) N=48 fused attempt (chunk defaults on at N>=48)
gate || { echo GATE_FAILED; echo CHAIN21_DONE; exit 1; }
BENCH_MODE=cavity3d BENCH_N=48 BENCH_STEPS=6 timeout 3600 python bench.py \
  > $R/c3d48_fused.json 2> $R/c3d48_fused.err
tail -1 $R/c3d48_fused.json

# 2) N=48 granular re-pin (post-EMA-adoption datum)
gate || { echo GATE_FAILED; echo CHAIN21_DONE; exit 1; }
BENCH_MODE=cavity3d BENCH_N=48 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  timeout 3600 python bench.py \
  > $R/c3d48_gran.json 2> $R/c3d48_gran.err
tail -1 $R/c3d48_gran.json

# 3) N=64 granular, EMA/linfast off (bench default at N>=64)
gate || { echo GATE_FAILED; echo CHAIN21_DONE; exit 1; }
BENCH_MODE=cavity3d BENCH_N=64 BENCH_GRANULAR=1 BENCH_STEPS=4 \
  timeout 5400 python bench.py \
  > $R/c3d64_gran.json 2> $R/c3d64_gran.err
tail -1 $R/c3d64_gran.json

# 4) N=64 fused attempt (stretch)
gate || { echo GATE_FAILED; echo CHAIN21_DONE; exit 1; }
BENCH_MODE=cavity3d BENCH_N=64 BENCH_STEPS=4 \
  timeout 5400 python bench.py \
  > $R/c3d64_fused.json 2> $R/c3d64_fused.err
tail -1 $R/c3d64_fused.json

echo CHAIN21_DONE
