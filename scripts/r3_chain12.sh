#!/bin/bash
# Round-3 TPU campaign, chain 12 (after chain 11): winmom r5 "fault"
# hypothesis test. Every r5 death printed 'TPU device error' — ALSO the
# tunnel watchdog's signature for single executions >~10 s. The timing
# harness chains WM_REPS=20 applies in ONE fori_loop execution; if the
# window kernel is merely SLOW at r5, that execution trips the watchdog
# and reads exactly like a kernel fault. Probe with WM_REPS=1 (one apply
# per device execution): a completion (at any speed) converts the
# "runtime fault" into a timing datum; a death at REPS=1 confirms a real
# in-kernel fault and the lcar ladder bisects the threshold.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain12
mkdir -p $R

# 0) the hypothesis test: r5, ONE apply per execution
gate
WM_REFINE=5 WM_REPS=1 timeout 1800 python scripts/winmom_bench.py \
  > $R/winmom_r5_reps1.log 2>&1
tail -4 $R/winmom_r5_reps1.log

# 1) lcar ladder between r4 (36k) and r5 (144k), REPS=1: fault threshold
#    if step 0 died, per-size scaling data if it ran
for LC in 0.05 0.035 0.025; do
  gate || continue
  WM_REFINE=4 WM_LCAR=$LC WM_REPS=1 timeout 1800 \
    python scripts/winmom_bench.py \
    > $R/winmom_lcar${LC}_reps1.log 2>&1
  tail -3 $R/winmom_lcar${LC}_reps1.log
done

echo CHAIN12_DONE
