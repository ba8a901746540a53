#!/bin/bash
# CPU f64 stability-probe campaign for the refine-2 shedding suppression
# (VERDICT r03 item 1): standard discretization, no-snap geometry ablation,
# and boundary-stress ds-term ablation. Each variant: settle onto the
# steady branch (BE), then measure the perturbation growth rate sigma
# (BDF2 control+perturbed pair). Run from repo root.
set -x
cd "$(dirname "$0")/.."

export SP_PLATFORM=cpu SP_X64=1
STEPS_BASE=${STEPS_BASE:-400}
STEPS_PROBE=${STEPS_PROBE:-400}

# 1) standard refine-2: settle from the decayed stage-2 checkpoint
SP_BASE_DT=0.01 SP_BASE_STEPS=$STEPS_BASE SP_CHUNK=50 \
  python scripts/stability_probe.py base 2 st2c_ckpt.npz
SP_STEPS=$STEPS_PROBE SP_DT=2.5e-3 SP_CHUNK=50 \
  python scripts/stability_probe.py probe 2

# 2) no-snap geometry (same topology; refined boundary midpoints stay on
#    the coarse polygon)
SP_SNAP=0 SP_BASE_DT=0.01 SP_BASE_STEPS=$STEPS_BASE SP_CHUNK=50 \
  python scripts/stability_probe.py base 2 st2c_ckpt.npz
SP_SNAP=0 SP_STEPS=$STEPS_PROBE SP_DT=2.5e-3 SP_CHUNK=50 \
  python scripts/stability_probe.py probe 2

# 3) drop the mu (grad u)^T n ds-term
FLOW_ABLATE_BND_STRESS=1 SP_TAG=_nostress SP_BASE_DT=0.01 \
  SP_BASE_STEPS=$STEPS_BASE SP_CHUNK=50 \
  python scripts/stability_probe.py base 2 st2c_ckpt.npz
FLOW_ABLATE_BND_STRESS=1 SP_TAG=_nostress SP_STEPS=$STEPS_PROBE \
  SP_DT=2.5e-3 SP_CHUNK=50 \
  python scripts/stability_probe.py probe 2

echo CAMPAIGN DONE
