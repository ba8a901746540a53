#!/bin/bash
# Re-run the 10M packed profile (prof10M failed on a sys.path bug) after
# campaign 2 finishes.
set -x
cd "$(dirname "$0")/.."
R=campaigns/r5
echo $$ > /tmp/r5prof.pid
while true; do
  pid="$(cat /tmp/r5campaign2.pid 2>/dev/null)"
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then sleep 60; continue; fi
  break
done
gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}
mark() { echo "$(date +%H:%M:%S) $1" >> $R/status.txt; }
mark "prof10M-retry start"
if gate; then
  PP_LCAR=0.0175 PP_REFINE=6 \
    timeout 4500 python scripts/patch_profile.py > $R/prof10m.log 2>&1
  mark "prof10M-retry rc=$?"
else mark "prof10M-retry GATE_FAILED"; fi
# 1.9M point for the per-DoF comparison (VERDICT #3: explain the 1.4x
# per-DoF drop 1.9M -> 10M)
mark "prof1p9M start"
if gate; then
  PP_LCAR=0.02 PP_REFINE=5 \
    timeout 2400 python scripts/patch_profile.py > $R/prof1p9m.log 2>&1
  mark "prof1p9M rc=$?"
else mark "prof1p9M GATE_FAILED"; fi
mark "R5PROF_DONE"
