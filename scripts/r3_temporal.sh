#!/bin/bash
# Round-3 temporal-suspect campaign for the refine-2 shedding suppression.
# The semi-discrete eigensolve (BENCH_NOTES) put the defect in the
# TIME-DISCRETE path: production BDF2+projection at dt=2.5e-3 damps the
# lambda=+2.57/s Hopf mode to sigma=-2.14/s. Discriminate the suspects:
#   1) solver slop        -> SP_TIGHT probe at the same dt
#   2) splitting error    -> dt-scaling: sigma(dt/2), sigma(2dt).
#      If the damping deficit (2.57 - sigma) scales ~dt^p the projection
#      splitting is guilty; if dt-independent it's tolerance slop.
#   3) ds-stress ablation probe (base already settled) for completeness.
# Serialized: one TPU chip.
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 12); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 15
  done
  return 1
}

export SP_PLATFORM=axon SP_X64=0 SP_CHUNK=25 SP_EPS=0.03

# 1) solver-slop ablation: tight tolerances, standard base
gate
SP_TIGHT=1 SP_TAG=_tight SP_BASE=stab_base_r2.npz SP_STEPS=600 SP_DT=2.5e-3 \
  timeout 6000 python scripts/stability_probe.py probe 2 2>&1 | tail -5

# 2a) dt halved (same physical window: 1200 steps)
gate
SP_TAG=_dthalf SP_BASE=stab_base_r2.npz SP_STEPS=1200 SP_DT=1.25e-3 \
  timeout 8000 python scripts/stability_probe.py probe 2 2>&1 | tail -5

# 2b) dt doubled (300 steps)
gate
SP_TAG=_dt2x SP_BASE=stab_base_r2.npz SP_STEPS=300 SP_DT=5e-3 \
  timeout 4000 python scripts/stability_probe.py probe 2 2>&1 | tail -5

# 3) boundary-stress ds-term ablation probe (base settled earlier)
gate
FLOW_ABLATE_BND_STRESS=1 SP_TAG=_nostress SP_STEPS=600 SP_DT=2.5e-3 \
  timeout 6000 python scripts/stability_probe.py probe 2 2>&1 | tail -5

echo R3_TEMPORAL_DONE
