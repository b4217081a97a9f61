#!/bin/bash
# Opportunistic clean-window catcher: probe every ~5 min; on the first
# PASS run one new-code x10 leg + the pinned r18 control back-to-back.
# Gives up after 9 probes (~45 min).
cd /root/repo
R=/root/repo/bench_runs_r19
for i in $(seq 1 9); do
  line=$(java -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.CalibProbe 1.0 2>/dev/null | grep calibprobe)
  echo "cleanwatch[$i] $line $(date -u +%FT%TZ)" >> $R/progress.log
  case "$line" in
    *ok=true*)
      echo "cleanwatch: CLEAN window at $(date -u +%FT%TZ) — firing pair" >> $R/progress.log
      (SPARK_GRAFT_SF_DIR=/root/repo/bench_scale/x10 SPARK_GRAFT_CPUS=32 \
        sbt -batch "runMain graft.Bench") 2>&1 \
        | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/x10_clean_new.json
      (cd /tmp/graft_ctrl_r18 && SPARK_GRAFT_SF_DIR=/root/repo/bench_scale/x10 \
        SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
        | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/x10_clean_ctrl.json
      echo "cleanwatch: pair done $(date -u +%FT%TZ)" >> $R/progress.log
      echo CLEANPAIR >> $R/done.flag
      exit 0
      ;;
  esac
  sleep 280
done
echo "cleanwatch: no clean window in 9 probes" >> $R/progress.log
