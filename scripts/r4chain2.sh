#!/bin/bash
# Round-4 chain 2 — the remaining Cd_max audit arms (runs after chain 1;
# waits on its pid file). The stage-3 converged Cd_max sits ~+0.2-0.7%
# above the published corridor top with St dead-on — candidates are
# TEMPORAL (dt / BDF2 peak clipping) and probe discretization (chain-1
# arm C). Each arm resumes the saturated stage-3 state, so a 3000-step
# measurement window is ~10 min at packed speed.
#  E) dt-halved arm: dt_max 1e-3 (Cd_max peaks are sharp; if the offset is
#     temporal, halving dt moves Cd_max toward the corridor ~4x (BDF2)).
#  F) dt-quartered arm: dt_max 5e-4 (Richardson point for the dt series).
set -x
cd "$(dirname "$0")/.."

while true; do
  pid="$(cat /tmp/r4chain1.pid 2>/dev/null)"
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

R=campaigns/r4chain1
mkdir -p $R

gate || { echo GATE_FAILED; echo R4CHAIN2_DONE; exit 1; }
ST_BACKEND=packed ST_RESUME=1 ST_CKPT=$R/st3_packed_ckpt.npz \
  ST_OUT=$R/st3_dt1e3.npz SHED_CHUNK=100 \
  timeout 10800 python scripts/schafer_turek.py 6000 0.03 3 1.0e-3 \
  > $R/st3_dt1e3.log 2>&1
tail -5 $R/st3_dt1e3.log

gate || { echo GATE_FAILED; echo R4CHAIN2_DONE; exit 1; }
ST_BACKEND=packed ST_RESUME=1 ST_CKPT=$R/st3_packed_ckpt.npz \
  ST_OUT=$R/st3_dt5e4.npz SHED_CHUNK=200 \
  timeout 14400 python scripts/schafer_turek.py 12000 0.03 3 5.0e-4 \
  > $R/st3_dt5e4.log 2>&1
tail -5 $R/st3_dt5e4.log

echo R4CHAIN2_DONE
