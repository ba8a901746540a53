#!/bin/bash
# Bisect the chain-18 1.9M-DoF regression (0.110 steps/s vs chain-16's
# 0.430, IDENTICAL iteration counts + healthy 494 ms poisson canary).
# Splits tree-change vs device/tunnel-state causes:
#   arm A: current tree            (expect 0.11 if tree-caused or device)
#   arm B: chain-16 tree (eef9e25) (0.43 = tree regression between
#          eef9e25..HEAD; 0.11 = device/tunnel drift, tree exonerated)
#   arm A2: current tree again     (back-to-back variance control)
# Runs in a detached worktree for arm B so the main tree stays intact.
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
