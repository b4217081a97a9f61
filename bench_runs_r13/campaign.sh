#!/bin/bash
# Round-13 bench campaign: 3x sf0.1 + 3x x10, run with NOTHING else on the
# box (the r11 campaign overlapped the driver's bench and contaminated
# BENCH_r11). Each run file is written ATOMICALLY (tmp + mv) as it
# completes, so a killed campaign still leaves only complete, parseable
# run files and a usable min-of-N; progress markers record how far it got.
set -x
cd /root/repo
R=/root/repo/bench_runs_r13
echo "started $(date -u +%FT%TZ)" > $R/progress.log
if [ ! -f /root/repo/bench_scale/x10/lineitem.parquet ]; then
  sbt -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 /root/repo/bench_scale/x10 10" > $R/scaledata.log 2>&1
fi
run_one() {  # $1 = sf dir, $2 = output basename
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 \
    | grep '^\[info\] {"metric"' | grep '"queries"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "$2 $(date -u +%FT%TZ)" >> $R/progress.log
}
for i in 1 2 3; do run_one /root/testdata/sf0.1 sf01_run$i; done
for i in 1 2 3; do run_one /root/repo/bench_scale/x10 x10_run$i; done
echo DONE > $R/done.flag
