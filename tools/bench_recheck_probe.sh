#!/usr/bin/env bash
# Proves the bench self-recheck (Bench.scala, round 16): a deliberately
# contaminated battery must still ship FINAL per-query numbers matching the
# clean anchor within noise, because any anchored query whose min-of-3
# exceeded max(2x anchor, anchor+0.5s) is re-measured after the battery
# (behind a bounded quiet wait) and the artifact takes the min.
#
# Protocol:
#   1. quiet run over a subset with SPARK_GRAFT_ANCHOR_OUT -> clean anchor
#   2. contaminated run: the same subset with BUSY_CORES cpu hogs injected
#      ~35s in (past sbt/JVM startup, inside the battery) for HOG_SEC;
#      the hogs die before the recheck phase
#   3. assert every anchored query's FINAL number <= 1.5x its anchor
#      (without the recheck, the r15 artifact carried 8x)
#
# Usage: tools/bench_recheck_probe.sh [sfdir]   (default /root/testdata/sf0.01)
set -u
SF=${1:-/root/testdata/sf0.01}
SUBSET="q73_ngram_jaccard q81_repeated_passages q82_distinct_sketch q86_robust_outliers q99_quantile_sketch"
BUSY_CORES=${BUSY_CORES:-12}
HOG_SEC=${HOG_SEC:-110}
ANCHOR=/tmp/bench_probe_anchor.json
OUT1=/tmp/bench_probe_clean.log
OUT2=/tmp/bench_probe_dirty.log

echo "[probe] 1/3 clean anchor run ($SF)"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=16 \
  SPARK_GRAFT_ANCHOR=/nonexistent SPARK_GRAFT_ANCHOR_OUT=$ANCHOR \
  sbt -batch "runMain graft.Bench $SUBSET" >$OUT1 2>&1
grep -q '"queries"' $ANCHOR || { echo "[probe] FAIL: no anchor written"; exit 1; }
echo "[probe] anchor: $(tr -d '\n ' <$ANCHOR)"

echo "[probe] 2/3 contaminated run: $BUSY_CORES hogs at t+35s for ${HOG_SEC}s"
( sleep 35
  for i in $(seq 1 $BUSY_CORES); do
    ( end=$((SECONDS + HOG_SEC)); while [ $SECONDS -lt $end ]; do :; done ) &
  done
  wait ) &
HOGPID=$!
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=16 SPARK_GRAFT_ANCHOR=$ANCHOR \
  sbt -batch "runMain graft.Bench $SUBSET" >$OUT2 2>&1
kill $HOGPID 2>/dev/null; wait $HOGPID 2>/dev/null

echo "[probe] 3/3 adjudicate"
grep '"metric":"bench_recheck"' $OUT2 | sed 's/^\[info\] //'
grep '"metric":"bench_summary"' $OUT2 | sed 's/^\[info\] //'
python3 - "$ANCHOR" "$OUT2" <<'EOF'
import json, re, sys
anchor = json.load(open(sys.argv[1]))["queries"]
final = {}
for line in open(sys.argv[2]):
    m = re.search(r'\{"metric":"bench_part".*', line)
    if m:
        final.update(json.loads(m.group(0))["queries"])
bad = []
for q, a in anchor.items():
    f = final.get(q)
    if f is None:
        bad.append(f"{q}: missing from final artifact"); continue
    print(f"[probe] {q}: anchor={a:.2f} final={f:.2f} ratio={f/max(a,1e-9):.2f}")
    if f > max(1.5 * a, a + 0.5):
        bad.append(f"{q}: final {f:.2f} > 1.5x anchor {a:.2f}")
if bad:
    print("[probe] FAIL:", "; ".join(bad)); sys.exit(1)
print("[probe] PASS: contaminated run's final numbers match the clean anchor")
EOF
