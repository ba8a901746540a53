#!/bin/bash
# TPU f32 stability-probe campaign for the refine-2 shedding suppression.
# snap and nosnap share mesh topology/shapes -> the BE-settle and
# BDF2-probe programs compile once and cache-hit for the second variant.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in 1 2 3 4 5 6 7 8; do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 15
  done
  return 1
}

export SP_PLATFORM=axon SP_X64=0 SP_CHUNK=25 SP_EPS=0.03
B=${STEPS_BASE:-400}
P=${STEPS_PROBE:-600}

gate
SP_BASE_DT=0.01 SP_BASE_STEPS=$B timeout 4000 \
  python scripts/stability_probe.py base 2 st2c_ckpt.npz
gate
SP_STEPS=$P SP_DT=2.5e-3 timeout 4000 \
  python scripts/stability_probe.py probe 2
gate
SP_SNAP=0 SP_BASE_DT=0.01 SP_BASE_STEPS=$B timeout 4000 \
  python scripts/stability_probe.py base 2 st2c_ckpt.npz
gate
SP_SNAP=0 SP_STEPS=$P SP_DT=2.5e-3 timeout 4000 \
  python scripts/stability_probe.py probe 2

echo TPU_CAMPAIGN_DONE
