#!/bin/bash
# Chain-21 tail: after the main campaign exits, re-run any stage whose
# stdout record is still empty with a LONGER timeout (this machine's jit
# cache started cold and a single local CPU core makes tracing slow —
# stage-0's 2400 s budget can be eaten entirely by the first remote
# compile; completed compiles persist in .jax_cache, so a retry resumes
# where the kill left off only if the compile finished — otherwise it
# pays it again with more headroom).
set -x
cd "$(dirname "$0")/.."

# wait for the main campaign: pid file while it runs (r3_chain21.sh now
# writes it), with a marker-file fallback so a missing pid cannot race
while true; do
  pid="$(cat /tmp/chain21.pid 2>/dev/null)"
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then sleep 60; continue; fi
  if [ -z "$pid" ] && ! grep -q CHAIN21_DONE /tmp/chain21_main.log 2>/dev/null; then
    # no pid and no completion marker: main not started yet (or log
    # elsewhere) — poll rather than racing it on the same device/files
    sleep 60; continue
  fi
  break
done

gate() {
  for i in $(seq 1 45); do
    timeout 90 python -c "import jax, jax.numpy as jnp; jnp.zeros(8).block_until_ready()" >/dev/null 2>&1 && return 0
    sleep 20
  done
  return 1
}

R=/tmp/r3chain21
mkdir -p $R

retry() { # name n gran steps timeout
  local name=$1 n=$2 gran=$3 steps=$4 to=$5
  if [ -s "$R/$name.json" ] && grep -q '"metric"' "$R/$name.json"; then
    return 0
  fi
  gate
  BENCH_MODE=cavity3d BENCH_N=$n BENCH_GRANULAR=$gran BENCH_STEPS=$steps \
    BENCH_SIZE_TIMEOUT=$to timeout $to python bench.py \
    > $R/$name.json 2> $R/$name.err
  tail -1 $R/$name.json
}

retry c3d32_repin 32 0 10 5400
retry c3d48_fused 48 0 6 6000
retry c3d48_gran 48 1 4 6000
retry c3d64_gran 64 1 4 7200
retry c3d64_fused 64 0 4 7200

# final mirror into the repo so a machine swap can't lose the records
mkdir -p campaigns/r3chain21
cp -r $R/. campaigns/r3chain21/ 2>/dev/null
echo CHAIN21_RETRY_DONE
