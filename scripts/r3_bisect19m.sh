#!/bin/bash
# Re-measure the 1.9M base point on a healthy worker (chain-18 postmortem:
# the 0.110/0.090 base/ema arms ran in a degraded device window that the
# mgbf16 worker crashes cleared — the later gb16 arm measured 0.401 and
# cavity3d-base 0.588 matched the chain-16 ledger exactly). Adaptive:
#   arm A: current tree. >=0.3 steps/s -> tree exonerated, STOP (the
#          device window explains chain-18's anomaly; save TPU time for
#          chain-20).
#   arm B (only if A < 0.3): chain-16 worktree (eef9e25) back-to-back —
#          splits tree regression vs persistent device drift.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3bisect19m
mkdir -p $R

gate
BENCH_REFINES=5 timeout 3600 python bench.py > $R/armA_head.json 2> $R/armA_head.err
tail -1 $R/armA_head.json

VAL=$(python -c "
import json
try: print(json.load(open('$R/armA_head.json'))['value'])
except Exception: print(0)")
OK=$(python -c "print(1 if float('$VAL' or 0) >= 0.3 else 0)")
if [ "$OK" = "1" ]; then
  echo "BISECT19M tree-exonerated armA=$VAL"
  # armC: fused momentum warm start at the default bench sizes
  # (physics-neutral: identical stopping target, pinned in
  # tests/test_ema.py) — the adoptable-default A/B against armA
  gate
  FLOW_MOM_WARMSTART=1 BENCH_REFINES=5 timeout 3600 python bench.py \
    > $R/armC_ws.json 2> $R/armC_ws.err
  tail -1 $R/armC_ws.json
  echo BISECT19M_DONE
  exit 0
fi

WT=/tmp/wt_chain16
git worktree remove --force $WT 2>/dev/null
git worktree add --detach $WT eef9e25
gate
( cd $WT && BENCH_REFINES=5 timeout 3600 python bench.py ) \
  > $R/armB_chain16.json 2> $R/armB_chain16.err
tail -1 $R/armB_chain16.json

gate
BENCH_REFINES=5 timeout 3600 python bench.py > $R/armA2_head.json 2> $R/armA2_head.err
tail -1 $R/armA2_head.json

git worktree remove --force $WT 2>/dev/null
echo BISECT19M_DONE
