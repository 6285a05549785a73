#!/bin/bash
# Round-5 validation sequence (run with NOTHING else on the box; do not
# touch src/ while this runs — each sbt invocation recompiles):
#
# CAVEAT measured post-campaign (BASELINE.md "round-5 final addendum"):
# on at least one VM placement, SPARK_DRIVER_MEM=48g (-Xmx48g) degrades
# allocation-heavy parallel Spark stages 5-20x (A/B'd: 65.8s vs 165.3s
# bench total on the same warm box; same-JVM thread calibration
# unaffected). The 48g legs below were healthy on the boot they ran on
# (absolute docs/s/core matched the 8g bench), but if re-running this
# script produces absurdly low absolute throughput with a fast
# calibration, drop SPARK_DRIVER_MEM first — sf1.0 ScalingBench runs
# fine at the 8g default.
#  1. CoreScaling same-hour ceiling (pre)
#  2. five FIXED ScalingBench pairs on sf2.0 with the new scan/shuffle
#     decomposition probes (verdict items 1+2)
#  3. CoreScaling (post)
#  4. ListingScale 1e4/1e5/1e6 (verdict item 9, after the NIO listing fix)
#  5. AnnRecallSweep n=1e5 full grid, n=1e6 rule-point (verdict item 6)
#  6. Bench at sf0.1 with the round-5 accounting (BENCH.json refresh)
set -u
cd /root/repo
LOG=/root/repo/data/r5_validation.log
{
  echo "=== r5 validation start $(date -u +%FT%TZ) ==="
  echo "--- CoreScaling pre ---"
  sbt -batch "runMain graft.tools.CoreScaling 60000 4,16"
  for i in 1 2 3 4 5; do
    echo "--- ScalingBench sf2.0 pair $i $(date -u +%FT%TZ) ---"
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_ITERS=3 \
      sbt -batch "runMain graft.ScalingBench /root/repo/data/docs/sf2.0"
  done
  echo "--- CoreScaling post $(date -u +%FT%TZ) ---"
  sbt -batch "runMain graft.tools.CoreScaling 60000 4,16"
  echo "--- ListingScale $(date -u +%FT%TZ) ---"
  sbt -batch "runMain graft.tools.ListingScale 10000,100000,1000000"
  echo "--- AnnRecallSweep 1e5 grid $(date -u +%FT%TZ) ---"
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.AnnRecallSweep 100000"
  echo "--- AnnRecallSweep 1e6 rule point $(date -u +%FT%TZ) ---"
  SPARK_DRIVER_MEM=48g GRAFT_ANN_BITS=14 GRAFT_ANN_TABLES=8,16 \
    sbt -batch "runMain graft.tools.AnnRecallSweep 1000000"
  echo "--- Bench sf0.1 $(date -u +%FT%TZ) ---"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_FILE=/root/repo/data/bench_r5.json \
    sbt -batch "runMain graft.Bench"
  echo "=== done $(date -u +%FT%TZ) ==="
} >>"$LOG" 2>&1
