#!/bin/bash
# Round-3 TPU stability-probe ablation campaign, part 2 (after standard
# -2.14 and nosnap -2.13): boundary-stress ds-term ablation, solver-slop
# (tight) ablation, then a refine-1 base settle for the two-point control.
# Serialized: one TPU chip. refine-1 BE settle needs dt<=0.01 + extra
# Newton headroom (dt=0.04 diverged cyclically from the shedding state).
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

# 1) drop the mu (grad u)^T n boundary-stress ds-term at refine-2
gate
FLOW_ABLATE_BND_STRESS=1 SP_TAG=_nostress SP_BASE_DT=0.01 SP_BASE_STEPS=400 \
  timeout 4000 python scripts/stability_probe.py base 2 st2c_ckpt.npz
gate
FLOW_ABLATE_BND_STRESS=1 SP_TAG=_nostress SP_STEPS=600 SP_DT=2.5e-3 \
  timeout 4000 python scripts/stability_probe.py probe 2

# 2) solver-slop ablation: tight tolerances, probe only (control run
#    cancels base drift; reuse the standard refine-2 base)
gate
SP_TIGHT=1 SP_TAG=_tight SP_BASE=stab_base_r2.npz SP_STEPS=600 SP_DT=2.5e-3 \
  timeout 6000 python scripts/stability_probe.py probe 2

# 3) refine-1 base settle (two-point control; probe separately once the
#    base converges — expected sigma > 0 there)
gate
SP_NEWTON_MAXIT=4 SP_BASE_DT=0.01 SP_BASE_STEPS=800 timeout 6000 \
  python scripts/stability_probe.py base 1 st1_ckpt.npz

echo R3_ABLATION_DONE
