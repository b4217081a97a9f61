#!/bin/bash
set -x
cd /root/repo
R=/root/repo/bench_runs_r11
sbt -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 /root/repo/bench_scale/x10 10" > $R/scaledata.log 2>&1
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/sf01_run$i.json
done
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/repo/bench_scale/x10 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/x10_run$i.json
done
echo DONE > $R/done.flag
