#!/bin/bash
# Round-17 bench campaign, run on FINAL round-17 code (the round-16
# verdict's item 1: freeze code -> campaign -> only docs commits after;
# the HEAD sha is recorded below and must equal the round's final code
# commit). 3x sf0.1 + 3x x10, plus the pinned-commit weather control
# (round-14 protocol): rebuild 0e2c350 (the round-16 final code commit
# whose campaign produced BASELINE.md's current columns) in a throwaway
# clone and run it once at x10 in the same window. A single control run
# compared against min-of-N references carries ~5% expected positive
# bias (BASELINE.md "control-ratio bias") — read ratios near 1.0 with
# that in mind.
# Run with NOTHING else on the box. Run files are written atomically
# (tmp + mv); progress markers record how far a killed campaign got.
# WINDOW 1 (archived in window1_dbf34a9/) ran at dbf34a9, three commits
# before final code; it was invalidated when the winnow guard rework
# (9e00ace, removes a ~2-3.7 s/call accounting cost at x10) landed
# after it — exactly the protocol gap item 1 forbids, so the campaign
# was re-run in full. Window-1 files are kept as the same-day weather
# record (its 0e2c350 control read 386.5 s = 1.067 vs the r16
# min-of-3, an adverse window).
# WINDOW 2 (archived in window2_9e00ace/) ran at 9e00ace and was in
# turn invalidated when the round's self-review rejected that commit's
# 10x cap raise (restored to 1e8 by 8d81062, changing the two winnow
# rows' x10 path); its control read 428.9 s = 1.184. WINDOW 3, on the
# final sha 8d81062, is the stamped campaign (control 447.4 s = 1.235
# — the day's worst weather; see BASELINE.md for the cross-window
# stamping rule and the path-identity proof).
set -x
cd /root/repo
R=/root/repo/bench_runs_r17
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
CTRL=/tmp/graft_ctrl_0e2c350
if [ ! -d $CTRL ]; then
  git clone -q /root/repo $CTRL && (cd $CTRL && git checkout -q 0e2c350)
fi
(cd $CTRL && sbt -batch compile) > $R/ctrl_build.log 2>&1
run_one /root/repo/bench_scale/x10 x10_control_0e2c350 $CTRL
echo DONE > $R/done.flag
