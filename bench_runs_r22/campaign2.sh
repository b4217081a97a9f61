#!/bin/bash
# Round-22 splice campaign: the verification-CSE fix (d70f0e4) landed
# after the main campaign's freeze sha (bd73fd1), so re-leg the final
# sha per the r18 window-3 path-scope rule: stamped mins for the ~16
# rows the fix touches come from these legs; every other row's bench
# path is identical across the two shas, so mins span both campaigns.
set -x
cd /root/repo
R=/root/repo/bench_runs_r22
echo "splice started $(date -u +%FT%TZ) HEAD=$(git rev-parse HEAD)" >> $R/progress.log
run_one() {
  (SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)" >> $R/progress.log
}
for i in 4 5; do run_one /root/testdata/sf0.1 sf01_run$i; done
for i in 4 5; do run_one /root/repo/bench_scale/x10 x10_run$i; done
echo DONE2 >> $R/done.flag
