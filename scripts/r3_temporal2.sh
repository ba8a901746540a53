#!/bin/bash
# Slop-source bisection campaign (after the refine-2 exact step map proved
# sigma_exact = +2.58 while the production probe decays at -2.14):
#   1) full-tight retry (first attempt crashed the tunnel worker; the
#      25-step chunk at 8 Newton iterations exceeds the ~10 s execution
#      watchdog -> 4-step chunks)
#   2) pressure+correction tight ONLY (momentum at production tolerances)
#   3) momentum tight ONLY (pressure/correction at production tolerances)
# Expected: the variant(s) that restore sigma > 0 identify the damping
# substep; full-tight should approach +2.5.
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

# 1) full tight, watchdog-safe chunking
gate
SP_TIGHT=1 SP_CHUNK=4 SP_TAG=_tight SP_BASE=stab_base_r2.npz \
  SP_STEPS=400 SP_DT=2.5e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -4

# 2) pressure+correction tight only
gate
SP_PRESSURE_RTOL=3e-7 SP_CORRECTION_RTOL=3e-7 SP_CHUNK=10 \
  SP_TAG=_ptight SP_BASE=stab_base_r2.npz SP_STEPS=400 SP_DT=2.5e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -4

# 3) momentum tight only
gate
SP_NEWTON_RTOL=1e-5 SP_NEWTON_MAXIT=8 SP_LINEAR_RTOL=1e-6 SP_CHUNK=6 \
  SP_TAG=_mtight SP_BASE=stab_base_r2.npz SP_STEPS=400 SP_DT=2.5e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -4

echo R3_TEMPORAL2_DONE
