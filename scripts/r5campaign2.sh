#!/bin/bash
# Round-5 device campaign 2 — the box-packed 3-D ladder (VERDICT r4 #2).
# Waits for campaign 1 (pid file), then runs the structural 3-D arms:
#   1) cavity3d N=32  box backend (vs the 0.745 einsum re-pin)
#   2) cavity3d N=48  box (the size that OOM'd einsum twice)
#   3) cavity3d N=64  box (~6.7M DoF — the first >=6M 3-D point)
#   4) cavity3d N=96  box (stretch, ~22M DoF)
set -x
cd "$(dirname "$0")/.."
R=campaigns/r5
mkdir -p $R
echo $$ > /tmp/r5campaign2.pid

while true; do
  pid="$(cat /tmp/r5campaign.pid 2>/dev/null)"
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

for N in 32 48 64 96; do
  mark "box3d N=$N start"
  if gate; then
    BENCH_3D_BACKEND=box BENCH_MODE=cavity3d BENCH_N=$N BENCH_STEPS=10 \
      timeout 5400 python bench.py > $R/box3d_n$N.json 2> $R/box3d_n$N.err
    mark "box3d N=$N rc=$?"
    tail -2 $R/box3d_n$N.json
  else mark "box3d N=$N GATE_FAILED"; fi
done

mark "R5CAMPAIGN2_DONE"
echo R5CAMPAIGN2_DONE
