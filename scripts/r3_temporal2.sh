#!/bin/bash
# Slop-source campaign, v2 (after the refine-2 exact step map proved
# sigma_exact = +2.58 while the production probe decays at -2.14, and the
# increment-form fix landed):
#   1) increment-form solves (new default) at PRODUCTION tolerances — the
#      candidate cure: if sigma flips positive, shedding validation can run
#      at production cost.
#   2) full-field (FLOW_ABS_SOLVES=1) + tight tolerances, 4-step chunks
#      (the 25-step chunk at 8 Newton iterations crashed the tunnel worker)
#      — direct confirmation of the slop mechanism.
#   3) full-field + pressure/correction tight ONLY — which substep damps.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 20); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

export SP_PLATFORM=axon SP_X64=0 SP_EPS=0.03

# 1) increment form, production tolerances
gate
SP_CHUNK=25 SP_TAG=_incr SP_BASE=stab_base_r2.npz SP_STEPS=600 SP_DT=2.5e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -4

# 2) full-field + tight (watchdog-safe chunking)
gate
FLOW_ABS_SOLVES=1 SP_TIGHT=1 SP_CHUNK=4 SP_TAG=_tight \
  SP_BASE=stab_base_r2.npz SP_STEPS=400 SP_DT=2.5e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -4

# 3) full-field + pressure/correction tight only
gate
FLOW_ABS_SOLVES=1 SP_PRESSURE_RTOL=3e-7 SP_CORRECTION_RTOL=3e-7 SP_CHUNK=10 \
  SP_TAG=_ptight SP_BASE=stab_base_r2.npz SP_STEPS=400 SP_DT=2.5e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -4

echo R3_TEMPORAL2_DONE
