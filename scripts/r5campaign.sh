#!/bin/bash
# Round-5 device campaign — serialized TPU queue. Order interleaves the
# VERDICT r4 arms so each item gets its first datum early:
#   1) chain-2 arm E  (Cd_max dt ladder, dt_max 1e-3)     [VERDICT #4]
#   2) live 10M re-measure (BENCH_LCAR=0.0175 refine 6)   [VERDICT #10, #3]
#   3) cavity3d N=48 fused, FLOW_CELL_CHUNK one notch down [VERDICT #2]
#   4) chain-2 arm F  (dt_max 5e-4, Richardson point)     [VERDICT #4]
#   5) packed-step profile at 10M                         [VERDICT #3]
#   6) cavity3d N=64 (EMA-off fallback)                   [VERDICT #2]
# Each job: fresh-process claimable gate, bounded timeout, own log.
set -x
cd "$(dirname "$0")/.."
R=campaigns/r5
mkdir -p $R
echo $$ > /tmp/r5campaign.pid

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

mark() { echo "$(date +%H:%M:%S) $1" >> $R/status.txt; }

# -- 1) chain-2 arm E: dt_max 1e-3 ------------------------------------------
# each arm resumes a PRIVATE COPY of the saturated stage-3 checkpoint:
# run_karman_fast writes its running checkpoint to ST_CKPT, which would
# otherwise clobber the pinned r4 artifact and chain the arms' states
mark "armE start"
cp campaigns/r4chain1/st3_packed_ckpt.npz $R/ckptE.npz
cp campaigns/r4chain1/st3_packed_ckpt.npz $R/ckptF.npz
if gate; then
  ST_BACKEND=packed ST_RESUME=1 ST_CKPT=$R/ckptE.npz \
    ST_OUT=$R/st3_dt1e3.npz SHED_CHUNK=100 \
    timeout 7200 python scripts/schafer_turek.py 6000 0.03 3 1.0e-3 \
    > $R/st3_dt1e3.log 2>&1
  mark "armE rc=$?"
else mark "armE GATE_FAILED"; fi

# -- 2) live 10M re-measure --------------------------------------------------
mark "live10M start"
if gate; then
  BENCH_LCAR=0.0175 BENCH_STEPS=20 \
    timeout 4500 python bench.py --single 6 1 > $R/live10m.log 2>&1
  mark "live10M rc=$?"
else mark "live10M GATE_FAILED"; fi

# -- 3) cavity3d N=48 fused, chunk notched down ------------------------------
mark "c3d48 start"
if gate; then
  FLOW_CELL_CHUNK=65536 BENCH_MODE=cavity3d BENCH_N=48 BENCH_STEPS=10 \
    timeout 5400 python bench.py > $R/c3d48_fused.json 2> $R/c3d48_fused.err
  mark "c3d48 rc=$?"
else mark "c3d48 GATE_FAILED"; fi

# -- 4) chain-2 arm F: dt_max 5e-4 ------------------------------------------
mark "armF start"
if gate; then
  ST_BACKEND=packed ST_RESUME=1 ST_CKPT=$R/ckptF.npz \
    ST_OUT=$R/st3_dt5e4.npz SHED_CHUNK=200 \
    timeout 10800 python scripts/schafer_turek.py 12000 0.03 3 5.0e-4 \
    > $R/st3_dt5e4.log 2>&1
  mark "armF rc=$?"
else mark "armF GATE_FAILED"; fi

# -- 5) packed profile at 10M ------------------------------------------------
mark "prof10M start"
if gate; then
  PP_LCAR=0.0175 PP_REFINE=6 \
    timeout 4500 python scripts/patch_profile.py > $R/prof10m.log 2>&1
  mark "prof10M rc=$?"
else mark "prof10M GATE_FAILED"; fi

# -- 6) cavity3d N=64 (EMA-off fallback auto in bench.py) --------------------
mark "c3d64 start"
if gate; then
  BENCH_MODE=cavity3d BENCH_N=64 BENCH_STEPS=10 \
    timeout 5400 python bench.py > $R/c3d64.json 2> $R/c3d64.err
  mark "c3d64 rc=$?"
else mark "c3d64 GATE_FAILED"; fi

mark "R5CAMPAIGN_DONE"
echo R5CAMPAIGN_DONE
