#!/bin/bash
# Round-4 TPU campaign, chain 1 — the packed-patch physics guard + the
# Cd_max audit (VERDICT r03 next #4) + the 3-D ladder redo (#2), all on
# the lane-packed stepper (~25-60x the round-3 step rate, so the whole
# chain fits in hours where round-3 needed days):
#  A) stage-2 DFG 2D-2 limit cycle FROM SCRATCH under ST_BACKEND=packed
#     (BDF2 + lagged + production tolerances): the adoption guard — St in
#     [0.295, 0.305], Cd_max near 3.24-3.25 reproduces the committed
#     stage-2 series (tests/data/schafer_turek_stage2*.npz).
#  B) stage-3 (refine-3, 590k) packed baseline, seeded from A's checkpoint
#     prolonged one level: the corridor point (round-3: Cd_max 3.2472,
#     +0.22% above [3.22, 3.24]).
#  C) force-probe quadrature audit: resume B's saturated state, 3000
#     steps measured with FLOW_FORCE_RULE=8 (vs default 5). If Cd_max
#     moves toward the corridor, the offset was probe quadrature.
#  D) cavity3d ladder redo under the packed-hoist dispatch fix:
#     N=32/48 fused, N=48/64 granular, N=64 fused.
set -x
cd "$(dirname "$0")/.."

echo $$ > /tmp/r4chain1.pid
trap 'rm -f /tmp/r4chain1.pid' EXIT

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=campaigns/r4chain1
mkdir -p $R

# A) packed stage-2 guard (from scratch; ~12k steps ~= 30 s sim)
gate || { echo GATE_FAILED; echo R4CHAIN1_DONE; exit 1; }
ST_BACKEND=packed ST_CKPT=$R/st2_packed_ckpt.npz ST_OUT=$R/st2_packed.npz \
  SHED_CHUNK=200 \
  timeout 14400 python scripts/schafer_turek.py \
  "${ST2_STEPS:-12000}" 0.03 2 2.5e-3 \
  > $R/st2_packed.log 2>&1
tail -6 $R/st2_packed.log

# B) packed stage-3 baseline seeded from A
gate || { echo GATE_FAILED; echo R4CHAIN1_DONE; exit 1; }
ST_BACKEND=packed ST_SEED_CKPT=$R/st2_packed_ckpt.npz ST_SEED_REFINE=2 \
  ST_CKPT=$R/st3_packed_ckpt.npz ST_OUT=$R/st3_packed.npz SHED_CHUNK=100 \
  timeout 14400 python scripts/schafer_turek.py \
  "${ST3_STEPS:-6000}" 0.03 3 2.0e-3 \
  > $R/st3_packed.log 2>&1
tail -6 $R/st3_packed.log

# C) probe-quadrature audit on the saturated stage-3 state
gate || { echo GATE_FAILED; echo R4CHAIN1_DONE; exit 1; }
FLOW_FORCE_RULE=8 ST_BACKEND=packed ST_RESUME=1 \
  ST_CKPT=$R/st3_packed_ckpt.npz ST_OUT=$R/st3_rule8.npz SHED_CHUNK=100 \
  timeout 10800 python scripts/schafer_turek.py \
  "${ST3C_STEPS:-3000}" 0.03 3 2.0e-3 \
  > $R/st3_rule8.log 2>&1
tail -6 $R/st3_rule8.log

# D) 3-D ladder redo (einsum path + chunking + packed-hoist dispatch fix)
for spec in "32 0 10" "48 0 6" "48 1 4" "64 1 4" "64 0 4"; do
  set -- $spec
  N=$1; GRAN=$2; STEPS=$3
  name=c3d${N}_$([ "$GRAN" = 1 ] && echo gran || echo fused)
  gate || { echo GATE_FAILED; break; }
  BENCH_MODE=cavity3d BENCH_N=$N BENCH_STEPS=$STEPS BENCH_TIMED_REPS=2 \
    BENCH_GRANULAR=$GRAN timeout 5400 python bench.py \
    > $R/$name.json 2> $R/$name.err
  tail -1 $R/$name.json
done

echo R4CHAIN1_DONE
