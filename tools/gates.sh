#!/bin/bash
# Re-stamp every scale/recall/plan gate on the current code in one
# command. Run after any operator change that touches dedup, similarity,
# or the as-of path, and at least once per round on the regenerated x10
# corpus (see BASELINE.md "Recall gates re-stamped" for what each proves):
#
#   SchemaCheck    — testdata schema-drift tripwire
#   SrpCheck       — SRP-LSH pair set vs brute-force cosine ground truth
#   MinhashCheck   — MinHash-LSH pair set vs exact inverted-index Jaccard
#   WinnowCheck    — winnowing prefix filter lossless vs uncapped join
#   ClusterExactCheck — dup-cluster/keep-best vs exact all-pairs Jaccard
#                  + from-scratch union-find (algorithm-independent; the
#                  registry oracles replay the LSH banding, see Text.scala)
#   RecallCheck    — all 12 self-validating ANN/SimHash gate rows true
#   AsOfScaleGate  — as-of merge join stays Exchange-free on bucketed input
#   srp_brute_check.py — q_hash_embed_neardup/q_semdedup operator output
#                  vs the pre-round-15 ALL-PAIRS brute-force DuckDB oracle
#                  at sf0.01 (engine- AND algorithm-independent; the
#                  registry oracles replay the SRP banding, see
#                  Extra.srpReplayCtes), PLUS a deterministic 1/50
#                  sampled-probe variant at x10 (every 50th doc
#                  brute-forced against the full corpus via numpy
#                  matmul; precision must be 1, recall floor 0.9 over
#                  the sampled true pairs — the scale where the r14
#                  cluster-oracle divergence appeared)
#
# Expected current state (round 12): everything OK/EXACT except one
# documented boundary miss each for SrpCheck (cos 0.614) and
# MinhashCheck (7 pairs at j 0.80-0.92) at x10 — the probabilistic
# LSH band-recall regime, see the operators' CONTRACT scaladoc.
set -e -o pipefail
cd /root/repo
SF001=${SF001:-/root/testdata/sf0.01}
SF01=${SF01:-/root/testdata/sf0.1}
X10=${X10:-/root/repo/bench_scale/x10}
# A gate tool's nonzero exit (e.g. RecallCheck's sys.exit(1) on
# gate_failed>0) fails the battery — but only AFTER its diagnostic lines
# are printed (capturing through a pipefail'd pipe under set -e would
# abort before the operator sees which gate row failed, and a passing
# tool with no "[info] [" lines would trip grep's no-match exit 1). The
# FAIL scan catches tools that report failure in text only. (MISMATCH is
# NOT asserted: Srp/MinhashCheck print it for the documented expected
# probabilistic boundary misses at x10 — see the header.)
run() {
  local raw status out
  set +e
  raw=$(sbt -batch "runMain $*" 2>&1)
  status=$?
  set -e
  out=$(printf '%s\n' "$raw" | grep -E "^\[info\] \[" | sed 's/^\[info\] //' || true)
  printf '%s\n' "$out"
  if [ "$status" -ne 0 ]; then
    echo "gates.sh: $* exited $status; last output lines:" >&2
    printf '%s\n' "$raw" | tail -20 >&2
    exit 1
  fi
  # Anchored: match FAIL only as a standalone token, so a future
  # passing summary like "FAILED=0" or a path containing FAIL cannot
  # spuriously abort the battery.
  if printf '%s' "$out" | grep -qE '(^|[^A-Za-z0-9_])FAIL([^A-Za-z0-9_]|$)'; then
    echo "gates.sh: FAIL in output of $*" >&2; exit 1
  fi
}
run graft.tools.SchemaCheck "$SF001"
run graft.tools.SrpCheck "$SF001" "$SF01" "$X10"
run graft.tools.MinhashCheck "$SF001" "$SF01" "$X10"
run graft.tools.WinnowCheck "$SF001" "$SF01"
run graft.tools.ClusterExactCheck "$SF001" "$SF01"
run graft.tools.RecallCheck "$SF01" "$X10"
run graft.tools.AsOfScaleGate "$SF01" "$X10"
# DuckDB-side all-pairs cross-check of the SRP-replay oracles: dump just
# the two operators' outputs at sf0.01, then compare against the
# quadratic brute-force oracle the sf0.01 scale still affords. Verify's
# output is captured and tailed on failure (it used to vanish into
# /dev/null, leaving a failing run with no diagnostics).
SRP_OUT=$(mktemp -d /tmp/graft_srp_gate.XXXXXX)
SRP_LOG=$(mktemp /tmp/graft_srp_gate_log.XXXXXX)
X10_OUT=$(mktemp -d /tmp/graft_x10_sweep.XXXXXX)
trap 'rm -rf "$SRP_OUT" "$SRP_LOG" "$X10_OUT"' EXIT  # cleaned on failing paths too (set -e)
SPARK_GRAFT_QUERIES=q_hash_embed_neardup,q_semdedup \
  sbt -batch "runMain graft.Verify $SF001 $SRP_OUT" >"$SRP_LOG" 2>&1 \
  || { echo "gates.sh: Verify for srp_brute_check failed; last output:" >&2
       tail -20 "$SRP_LOG" >&2; exit 1; }
python3 tools/srp_brute_check.py "$SF001" "$SRP_OUT"
# The sampled-probe variant at x10: the registry's x10 sweep follows the
# SRP-replay oracle, so this is the only x10 check whose ground truth is
# independent of the operator's own banding.
rm -rf "$SRP_OUT"/*
SPARK_GRAFT_QUERIES=q_hash_embed_neardup \
  sbt -batch "runMain graft.Verify $X10 $SRP_OUT" >"$SRP_LOG" 2>&1 \
  || { echo "gates.sh: x10 Verify for srp_brute_check failed; last output:" >&2
       tail -20 "$SRP_LOG" >&2; exit 1; }
python3 tools/srp_brute_check.py "$X10" "$SRP_OUT" --sample 50
# Full x10 oracle sweep from a FRESH Verify dump (round-17 item 7):
# previously the sweep required a hand-run dump at x10, so "gates on
# this sha" could silently omit it. Folding the dump in makes the
# battery self-contained — one invocation re-stamps every gate AND the
# full registry's x10 parity. ~15 min: a full Verify at x10 plus one
# DuckDB replay per oracle (600 s budget each, like round 15+).
echo "[sweep] dumping full registry at x10 for the oracle sweep..."
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
  sbt -batch "runMain graft.Verify $X10 $X10_OUT" >"$SRP_LOG" 2>&1 \
  || { echo "gates.sh: full x10 Verify for the oracle sweep failed; last output:" >&2
       tail -20 "$SRP_LOG" >&2; exit 1; }
python3 tools/sweep_x10.py "$X10" "$X10_OUT" 600
