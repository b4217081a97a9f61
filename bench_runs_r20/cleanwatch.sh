#!/bin/bash
# Round-20 clean-window catcher — runs across the WHOLE round (r19 item 1).
# Probes machine weather every ~5 min with graft.tools.CalibProbe (runs only
# the bench's fixed-work calibration jobs; clean band < 1.0). While the
# builder is doing heavy local work it touches bench_runs_r20/HOLD and the
# watcher skips probes (a probe under self-inflicted load would only waste
# the window). On a clean probe it fires same-window new+control pairs:
# sf0.1 first (fast, ~8 min), re-probe, then x10 (~15 min/leg), re-probe —
# every leg bracketed by probe readings so stamping can verify the window
# held. Control = round-19 final sha 78093e1 (/tmp/graft_ctrl_r19).
# Fires at most $MAXPAIRS times (min-of-N across clean legs), then keeps
# probing to the end so the round has a full weather record either way.
cd /root/repo
R=/root/repo/bench_runs_r20
CTRL=/tmp/graft_ctrl_r19
NEW=/tmp/graft_new_r20   # pinned at the latest committed round-20 sha; the
                         # builder fast-forwards + rebuilds it at milestones
HOURS=${1:-6}            # run until this many hours from launch (HELD
                         # iterations don't burn coverage — the r20 fix
                         # over the count-based first version)
MAXPAIRS=${2:-2}
DEADLINE=$(( $(date +%s) + HOURS * 3600 ))
pairs=0

proberead() {
  java -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.CalibProbe 1.0 2>/dev/null | grep calibprobe
}

run_one() { # sfdir name repo
  (cd "$3" && SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench") 2>&1 \
    | grep '^\[info\] {"metric"' | sed 's/^\[info\] //' > $R/$2.tmp
  if [ -s $R/$2.tmp ]; then mv $R/$2.tmp $R/$2.json; else rm -f $R/$2.tmp; fi
  echo "leg $2 done $(date -u +%FT%TZ)" >> $R/progress.log
}

i=0
while [ $(date +%s) -lt $DEADLINE ]; do
  i=$((i+1))
  if [ -e $R/STOP ]; then echo "cleanwatch: STOP at probe $i" >> $R/progress.log; exit 0; fi
  if [ -e $R/HOLD ]; then
    echo "cleanwatch[$i] HELD (builder busy) $(date -u +%FT%TZ)" >> $R/progress.log
    sleep 120; continue
  fi
  line=$(proberead)
  echo "cleanwatch[$i] $line $(date -u +%FT%TZ)" >> $R/progress.log
  case "$line" in
    *ok=true*)
      if [ $pairs -ge $MAXPAIRS ]; then sleep 280; continue; fi
      pairs=$((pairs+1))
      touch $R/FIRING
      echo "cleanwatch: CLEAN window, firing pair set $pairs NEW=$(git -C $NEW rev-parse --short HEAD) CTRL=$(git -C $CTRL rev-parse --short HEAD) $(date -u +%FT%TZ)" >> $R/progress.log
      run_one /root/testdata/sf0.1 "sf01_clean${pairs}_new"  $NEW
      run_one /root/testdata/sf0.1 "sf01_clean${pairs}_ctrl" $CTRL
      echo "midprobe $(proberead) $(date -u +%FT%TZ)" >> $R/progress.log
      run_one /root/repo/bench_scale/x10 "x10_clean${pairs}_new"  $NEW
      run_one /root/repo/bench_scale/x10 "x10_clean${pairs}_ctrl" $CTRL
      echo "postprobe $(proberead) $(date -u +%FT%TZ)" >> $R/progress.log
      rm -f $R/FIRING
      echo "cleanwatch: pair set $pairs done $(date -u +%FT%TZ)" >> $R/progress.log
      echo "CLEANPAIR$pairs" >> $R/done.flag
      ;;
  esac
  sleep 280
done
echo "cleanwatch: deadline reached after $i probes, $pairs pair sets $(date -u +%FT%TZ)" >> $R/progress.log
