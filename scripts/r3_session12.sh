#!/bin/bash
# Round-3 session-12 TPU queue (runs after session11's chain-18 +
# stage-1 regen finish):
#   1) r3_bisect19m.sh — split the 1.9M 0.110-vs-0.430 anomaly
#      (current tree vs chain-16 worktree, back-to-back)
#   2) r3_chain20.sh  — granular linfast 10M km ladder + warm start
#   3) r3_chain19b.sh — 10M fused attempt + dispatch profiler +
#      cavity3d N=64 retry
set -x
cd "$(dirname "$0")/.."

# wait for session11 (chain-18 + stage-1 regen) to release the device
while kill -0 "$(cat /tmp/session11.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

bash scripts/r3_bisect19m.sh 2>&1 | tee /tmp/bisect19m_driver.log
bash scripts/r3_chain20.sh   2>&1 | tee /tmp/chain20_driver.log
bash scripts/r3_chain19b.sh  2>&1 | tee /tmp/chain19b_driver.log
echo SESSION12_DONE
