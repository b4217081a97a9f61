#!/bin/bash
# Round-22 bench campaign (the BASELINE.md re-stamp queued since r21):
# runs on the FINAL round-22 code (freeze -> campaign -> only docs
# commits after; HEAD sha recorded in progress.log). 3x sf0.1 + 3x x10,
# plus the pinned-commit weather control: the round-21 final sha a533124
# (worktree at /tmp/graft_r22_before) run once at x10 in the same
# window. A single control run compared against min-of-N references
# carries ~5% expected positive bias (BASELINE.md "control-ratio bias").
# Run with NOTHING else on the box. Run files are written atomically
# (tmp + mv); progress markers record how far a killed campaign got.
set -x
cd /root/repo
R=/root/repo/bench_runs_r22
echo "started $(date -u +%FT%TZ) HEAD=$(git rev-parse HEAD)" > $R/progress.log
run_one() {  # $1 = sf dir, $2 = output basename, $3 = repo dir
  local repo=${3:-/root/repo}
  (cd "$repo" && SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ) load=$(cut -d' ' -f1-3 /proc/loadavg)" >> $R/progress.log
}
for i in 1 2 3; do run_one /root/testdata/sf0.1 sf01_run$i; done
for i in 1 2 3; do run_one /root/repo/bench_scale/x10 x10_run$i; done
# pinned-commit control at x10, same window (r21 final sha, prebuilt worktree)
run_one /root/repo/bench_scale/x10 x10_control_a533124 /tmp/graft_r22_before
echo DONE > $R/done.flag
