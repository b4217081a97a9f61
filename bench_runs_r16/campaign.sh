#!/bin/bash
# Round-16 bench campaign: 3x sf0.1 + 3x x10 on FINAL round-16 code,
# plus the pinned-commit weather control (round-14 protocol): rebuild
# 5345878 (the round-15 final commit whose campaign produced
# BASELINE.md's current columns) in a throwaway clone and run it once
# at x10 in the same window. NOTE the round-15 x10 column was itself
# stamped under ~1.16x-adverse weather (both windows, dual controls) —
# a control reading BELOW its own r15 mins therefore means this window
# is FAIRER than r15's, and the control ratio quantifies exactly how
# much of any new-code x10 delta is weather differential vs code.
# Run with NOTHING else on the box. Run files are written atomically
# (tmp + mv); progress markers record how far a killed campaign got.
set -x
cd /root/repo
R=/root/repo/bench_runs_r16
echo "started $(date -u +%FT%TZ)" > $R/progress.log
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
CTRL=/tmp/graft_ctrl_5345878
if [ ! -d $CTRL ]; then
  git clone -q /root/repo $CTRL && (cd $CTRL && git checkout -q 5345878)
fi
(cd $CTRL && sbt -batch compile) > $R/ctrl_build.log 2>&1
run_one /root/repo/bench_scale/x10 x10_control_5345878 $CTRL
echo DONE > $R/done.flag
