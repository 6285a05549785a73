#!/bin/bash
# Round-4 validation sequence, after the scan-granularity root-cause fix:
#  1. CoreScaling same-hour ceiling
#  2. three FIXED ScalingBench pairs on sf2.0 (16m splits + 4-waves floor)
#  3. CoreScaling again
#  4. AnnScale 50k (all-pairs anchor) / 200k / 1M (planted ground truth)
set -u
cd /root/repo
LOG=/root/repo/data/r4_validation.log
{
  echo "=== r4 validation start $(date -u +%FT%TZ) ==="
  echo "--- CoreScaling pre ---"
  sbt -batch "runMain graft.tools.CoreScaling 60000 4,16"
  for i in 1 2 3; do
    echo "--- ScalingBench FIXED sf2.0 pair $i $(date -u +%FT%TZ) ---"
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_ITERS=3 \
      sbt -batch "runMain graft.ScalingBench /root/repo/data/docs/sf2.0"
  done
  echo "--- CoreScaling post $(date -u +%FT%TZ) ---"
  sbt -batch "runMain graft.tools.CoreScaling 60000 4,16"
  echo "--- AnnScale 50k/200k/1M $(date -u +%FT%TZ) ---"
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.AnnScale 50000,200000,1000000"
  echo "=== done $(date -u +%FT%TZ) ==="
} >>"$LOG" 2>&1
