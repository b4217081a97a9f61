#!/bin/bash
# Round-18 window 3: re-stamp after the guard-cost fix (df persisted under
# the guard + single-histogram bounds), which changes the winnow rows' and
# (marginally) every guarded dedup row's bench path — the winnow stamps
# must come from THIS window (the round-17 window-3 rule). Trimmed to
# 2 sf0.1 + 2 x10 legs + the pinned control to fit the round's clock.
set -x
cd /root/repo
R=/root/repo/bench_runs_r18
echo "window3 started $(date -u +%FT%TZ) HEAD=$(git rev-parse HEAD)" >> $R/progress.log
run_one() {
  local repo=${3:-/root/repo}
  (cd "$repo" && SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ)" >> $R/progress.log
}
run_one /root/repo/bench_scale/x10 w3_x10_run1
run_one /root/repo/bench_scale/x10 w3_x10_run2
run_one /root/testdata/sf0.1 w3_sf01_run1
run_one /root/testdata/sf0.1 w3_sf01_run2
CTRL=/tmp/graft_ctrl_8d81062
(cd $CTRL && sbt -batch compile) >> $R/ctrl_build.log 2>&1
run_one /root/repo/bench_scale/x10 w3_x10_control_8d81062 $CTRL
echo W3DONE >> $R/done.flag
