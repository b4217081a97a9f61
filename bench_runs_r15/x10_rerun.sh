#!/bin/bash
# x10 re-run after the first window's pinned control read 1.164
# aggregate vs its own r14 mins (weather-elevated window; protocol says
# re-run later and keep both sets). Same runner as campaign.sh.
set -x
cd /root/repo
R=/root/repo/bench_runs_r15
run_one() {
  local repo=${3:-/root/repo}
  (cd "$repo" && SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ)" >> $R/progress.log
}
for i in 4 5 6; do run_one /root/repo/bench_scale/x10 x10_run$i; done
run_one /root/repo/bench_scale/x10 x10_control2_91c75bc /tmp/graft_ctrl_91c75bc
echo DONE2 >> $R/done.flag
