#!/bin/bash
# Round-18 bench campaign, run on FINAL round-18 code (freeze -> campaign
# -> only docs commits after; the HEAD sha is recorded in progress.log and
# must equal the round's final code commit). 3x sf0.1 + 3x x10, plus the
# pinned-commit weather control: rebuild 8d81062 (the round-17 final
# operator commit whose window-3 campaign produced BASELINE.md's stamped
# x10 column) in a throwaway clone and run it once at x10 in the same
# window. A single control run compared against min-of-N references
# carries ~5% expected positive bias (BASELINE.md "control-ratio bias") —
# read ratios near 1.0 with that in mind. Round-17 item 3 asks for ONE
# genuinely clean window (control <= ~1.05 after bias) to reset the
# regression-hunt reference: if the control reads adverse, re-run the
# window later rather than stamping the first attempt.
# Run with NOTHING else on the box. Run files are written atomically
# (tmp + mv); progress markers record how far a killed campaign got.
set -x
cd /root/repo
R=/root/repo/bench_runs_r18
echo "started $(date -u +%FT%TZ) HEAD=$(git rev-parse HEAD)" > $R/progress.log
run_one() {  # $1 = sf dir, $2 = output basename, $3 = repo dir
  local repo=${3:-/root/repo}
  (cd "$repo" && SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ)" >> $R/progress.log
}
for i in 1 2 3; do run_one /root/testdata/sf0.1 sf01_run$i; done
for i in 1 2 3; do run_one /root/repo/bench_scale/x10 x10_run$i; done
# pinned-commit control at x10, same window
CTRL=/tmp/graft_ctrl_8d81062
if [ ! -d $CTRL ]; then
  git clone -q /root/repo $CTRL && (cd $CTRL && git checkout -q 8d81062)
fi
(cd $CTRL && sbt -batch compile) > $R/ctrl_build.log 2>&1
run_one /root/repo/bench_scale/x10 x10_control_8d81062 $CTRL
echo DONE > $R/done.flag
