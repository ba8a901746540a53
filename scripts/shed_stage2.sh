#!/bin/bash
# Stage-2 Schafer-Turek shedding campaign at refine-2 (148k DoF) — the
# north-star accuracy run, enabled by the round-3 diagnosis: the exact
# step map is unstable (sigma=+2.58) and the production decay was solver
# slop; with increment-form solves (and/or tight tolerances) the discrete
# flow sheds. Seeds from the BE-settled discrete steady base plus the
# antisymmetric probe perturbation, runs ~20 s of physical time to
# saturation, reports St / Cd_max / Cl_amp on the settled half.
#
#   TOL=prod  (default) production tolerances + increment form
#   TOL=tight f32-achievable tight set (if prod still damps)
set -x
cd "$(dirname "$0")/.."

gate() {
  for i in $(seq 1 20); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

TOL=${TOL:-prod}
STEPS=${STEPS:-8000}
DT=${DT:-2.5e-3}

ENV=""
if [ "$TOL" = "tight" ]; then
  export ST_TOL=tight
fi

gate
# seed: settled steady base + probe perturbation (ST_RESUME on the staged
# checkpoint with re-perturbation), fixed dt via dt_max
python - <<'EOF'
# stage the base state as a campaign checkpoint (package format)
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")
import numpy as np
from flow_tpu.io import save_checkpoint
d = np.load("stab_base_r2.npz")
save_checkpoint(
    "st2_stage2_ckpt.npz", {"U": d["U"], "P": d["P"]}, {"dt": 2.5e-3}
)
print("seed staged", d["U"].shape)
EOF
ST_CKPT=st2_stage2_ckpt.npz ST_RESUME=1 ST_REPERTURB=1 ST_PERTURB=0.05 \
  SHED_CHUNK=${SHED_CHUNK:-25} \
  timeout 28800 python scripts/schafer_turek.py $STEPS 0.03 2 $DT \
  2>&1 | tail -12
echo SHED_STAGE2_DONE
