#!/bin/bash
# Round-5 chain 3 — 2-D packed momentum-solver A/B (VERDICT r4 #3):
# the GMRES(32) batched-MGS basis is ~[33, 2*n2] read twice per iteration
# — at 10M that is ~6 GB/iter of HBM traffic vs ~0.7 GB for the operator
# apply. BiCGStab holds no basis. Both solvers are physics-guarded
# (tests/test_shedding_validation.py gmres + the pre-r3 bicgstab cycles).
# Arms: refine-5 (1.9M) and refine-6 (10M) with BENCH_MOM_SOLVER=bicgstab.
set -x
cd "$(dirname "$0")/.."
R=campaigns/r5
echo $$ > /tmp/r5campaign3.pid
while true; do
  pid="$(cat /tmp/r5prof.pid 2>/dev/null)"
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

mark "bicgstab1p9 start"
if gate; then
  BENCH_MOM_SOLVER=bicgstab BENCH_STEPS=20 \
    timeout 3000 python bench.py --single 5 1 > $R/bicgstab1p9.log 2>&1
  mark "bicgstab1p9 rc=$?"
  grep BENCH_ENTRY $R/bicgstab1p9.log | tail -1
else mark "bicgstab1p9 GATE_FAILED"; fi

mark "bicgstab10m start"
if gate; then
  BENCH_MOM_SOLVER=bicgstab BENCH_LCAR=0.0175 BENCH_STEPS=20 \
    timeout 4500 python bench.py --single 6 1 > $R/bicgstab10m.log 2>&1
  mark "bicgstab10m rc=$?"
  grep BENCH_ENTRY $R/bicgstab10m.log | tail -1
else mark "bicgstab10m GATE_FAILED"; fi
mark "R5CAMPAIGN3_DONE"
