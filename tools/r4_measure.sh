#!/bin/bash
# Round-4 measurement sequence (run detached; nothing else may use sbt/CPU
# concurrently — see the VM-noise protocol in BASELINE.md).
#  1. CoreScaling same-hour calibration (pure-thread ceiling, 4 vs 16)
#  2. five ScalingBench pairs on sf2.0 (1.2M docs), local[4] vs local[16]
#  3. CoreScaling again (post-pairs drift check)
#  4. AnnScale 50k (all-pairs anchor) / 200k / 1M (planted ground truth)
set -u
cd /root/repo
LOG=/root/repo/data/r4_measurements.log
{
  echo "=== r4 measurement run start $(date -u +%FT%TZ) ==="
  echo "--- CoreScaling pre ---"
  sbt -batch "runMain graft.tools.CoreScaling 60000 4,16"
  for i in 1 2 3 4 5; do
    echo "--- ScalingBench sf2.0 pair $i $(date -u +%FT%TZ) ---"
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_ITERS=3 \
      sbt -batch "runMain graft.ScalingBench /root/repo/data/docs/sf2.0"
  done
  echo "--- CoreScaling post $(date -u +%FT%TZ) ---"
  sbt -batch "runMain graft.tools.CoreScaling 60000 4,16"
  echo "--- AnnScale 50k/200k/1M $(date -u +%FT%TZ) ---"
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.AnnScale 50000,200000,1000000"
  echo "=== done $(date -u +%FT%TZ) ==="
} >>"$LOG" 2>&1
