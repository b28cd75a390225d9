#!/bin/bash
# Fresh-JVM per-query spot bench (round 11, VERDICT r10 #8): the shared
# ~300-query bench JVM carries ambient cost (persisted indexes, GC,
# codegen-cache pressure) that inflates individual timings 20-40%, so
# cross-round per-query comparisons on the whole-bench map are only valid
# at equal registry size. This script runs ONE sbt/Spark JVM PER QUERY
# for the N slowest queries of the latest whole-bench map
# (/tmp/graft_bench.json) and WRITES the isolated numbers to
# BENCH_SPOT.json (overwritten per run — the file is committed, so the
# cross-round history lives in git; diff against the previous commit).
#
# Hardened (round 12, ADVICE r11 #2): a missing /tmp/graft_bench.json or a
# query that yields no time fails the run BEFORE touching BENCH_SPOT.json —
# results build in a temp file and move into place only when every query
# produced a number, so the committed comparator can never be silently
# overwritten with nulls or an empty query map.
#
# CROSS-ROUND CAVEAT (round 12): fresh-JVM spot isolates shared-JVM
# ambient state but NOT machine drift — round 12 measured +31-61% on
# five unchanged queries that bisected to the MACHINE (same times at the
# previous round's commit). Before believing a cross-round spot delta,
# BenchOne one unchanged reference query at the previous round's commit
# and scale by that calibration ratio.
#
# Usage: [N=10] [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1] tools/bench_spot.sh [query ...]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${N:-10}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  if [ ! -f /tmp/graft_bench.json ]; then
    echo "[bench_spot] FATAL: /tmp/graft_bench.json missing — run graft.Bench first" >&2
    exit 1
  fi
  mapfile -t QUERIES < <(python3 - "$N" <<'EOF'
import json, sys
m = json.load(open("/tmp/graft_bench.json"))["queries"]
for q, _ in sorted(m.items(), key=lambda kv: -kv[1])[: int(sys.argv[1])]:
    print(q)
EOF
)
fi
if [ ${#QUERIES[@]} -eq 0 ]; then
  echo "[bench_spot] FATAL: empty query list" >&2
  exit 1
fi

OUT="BENCH_SPOT.json"
TMP="$(mktemp)"
trap 'rm -f "$TMP"' EXIT
echo "[bench_spot] ${#QUERIES[@]} queries, fresh JVM each, sf dir $SF"
{
  printf '{"sf_dir": "%s", "protocol": "fresh-jvm min-of-2", "queries": {' "$SF"
  first=1
  for q in "${QUERIES[@]}"; do
    # sbt prefixes runMain stdout with "[info] " — don't anchor, and pick
    # the time field relative to the benchone tag
    log=$(SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.BenchOne $q" 2>/dev/null) || {
      echo "[bench_spot] FATAL: BenchOne $q exited non-zero" >&2; exit 1; }
    t=$(printf '%s\n' "$log" | grep -E "\[benchone\] $q run" |
      sed -E "s/.*\[benchone\] $q run[0-9]+ ([0-9.]+)s .*/\1/" | sort -n | head -1)
    if [ -z "$t" ]; then
      echo "[bench_spot] FATAL: no time parsed for $q — BENCH_SPOT.json left untouched" >&2
      exit 1
    fi
    [ $first -eq 1 ] || printf ', '
    printf '"%s": %s' "$q" "$t"
    first=0
    echo "[bench_spot] $q $t" >&2
  done
  printf '}}\n'
} > "$TMP"
python3 -c "import json,sys; json.load(open('$TMP'))" || {
  echo "[bench_spot] FATAL: temp output is not valid JSON" >&2; exit 1; }
mv "$TMP" "$OUT"
trap - EXIT
echo "[bench_spot] wrote $OUT"
