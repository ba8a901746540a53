#!/bin/bash
# Round-3 session-11 TPU campaign wrapper:
#   A) chain-18 (bf16 bandwidth A/B ladders + 7.6M fused re-measure)
#   B) stage-1 seed regeneration (st1_r3.npz was lost to the machine swap;
#      chain-19's bf16 physics guard needs it)
# chain-19 launches separately after the A/B verdicts pick the ARMS set.
set -x
cd "$(dirname "$0")/.."

bash scripts/r3_chain18.sh 2>&1 | tee /tmp/chain18_driver.log

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain19
mkdir -p $R

if [ ! -f st1_r3.npz ]; then
  gate
  ST_CKPT=st1_r3.npz ST_OUT=$R/stage1_regen.npz SHED_CHUNK=25 \
    timeout 7200 python scripts/schafer_turek.py 5000 0.03 1 4.0e-3 \
    > $R/stage1_regen.log 2>&1
  tail -6 $R/stage1_regen.log
fi

echo SESSION11_PREP_DONE
