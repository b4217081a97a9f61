#!/bin/bash
# Round-19 campaign, CALIB-GATED (the round-16..18 carried item): before
# each single leg a ~20 s probe (graft.tools.CalibProbe) runs ONLY the
# bench's fixed-work calibration jobs; a leg is marked gated=PASS when
# the probe's shuffle reading is < 1.0 (clean-window band — adverse
# windows measured 1.3-3.5 on this box). Stamping uses per-query mins
# from gated-PASS legs only. Control legs (round-18 final sha 5953dfb,
# worktree /tmp/graft_ctrl_r18) run back-to-back with new-code legs in
# the same window for the code-vs-code A/B. Probe retries up to 3x with
# a 90 s sleep; if all fail the leg still runs (A/B stays valid in any
# shared weather) but is marked gated=FAIL and excluded from stamping.
set -x
cd /root/repo
R=/root/repo/bench_runs_r19
CTRL=/tmp/graft_ctrl_r18
echo "campaign started $(date -u +%FT%TZ) HEAD=$(git rev-parse HEAD)" >> $R/progress.log

probe() { # prints PASS/FAIL, records the reading
  for i in 1 2 3; do
    line=$(java -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.tools.CalibProbe 1.0 2>/dev/null | grep calibprobe)
    echo "probe[$i] $line $(date -u +%FT%TZ)" >> $R/progress.log
    case "$line" in *ok=true*) echo PASS; return;; esac
    sleep 90
  done
  echo FAIL
}

run_one() { # sfdir name [repo]
  local repo=${3:-/root/repo}
  (cd "$repo" && SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ)" >> $R/progress.log
}

gated_pair() { # sfdir newname ctrlname
  g=$(probe)
  echo "gate for $2: $g" >> $R/progress.log
  run_one $1 "$2_gated_${g}"
  run_one $1 "$3" $CTRL
}

gated_single() { # sfdir newname
  g=$(probe)
  echo "gate for $2: $g" >> $R/progress.log
  run_one $1 "$2_gated_${g}"
}

gated_pair  /root/repo/bench_scale/x10 x10_run1 x10_ctrl1
gated_pair  /root/testdata/sf0.1      sf01_run1 sf01_ctrl1
gated_pair  /root/repo/bench_scale/x10 x10_run2 x10_ctrl2
gated_single /root/testdata/sf0.1     sf01_run2
gated_single /root/repo/bench_scale/x10 x10_run3
gated_single /root/testdata/sf0.1     sf01_run3
echo DONE >> $R/done.flag
