#!/bin/bash
# Per-query oracle compare with a timeout — for scale-replica gates
# (/tmp/sf3.0 etc.) where a handful of oracles are DELIBERATE brute-force
# ground-truth definitions (all-pairs self-joins) that are quadratic by
# design and infeasible in DuckDB at 30x+, while the engine side finishes
# everything. PASS/FAIL per query; TIMEOUT marks the oracle (not the
# engine) as infeasible at this scale.
#
# Usage: tools/compare_chunked.sh <sfDir> <verifyOutDir> [timeoutSec] [par]
set -u
SF=$1; OUT=$2; T=${3:-180}; PAR=${4:-4}
cd "$(dirname "$0")/.."
ls "$OUT" | grep -v oracle_sql.json | sort | \
  xargs -P "$PAR" -I{} bash -c '
    r=$(timeout '"$T"' python tools/compare.py '"$SF"' '"$OUT"' {} 2>&1)
    rc=$?
    if [ $rc -eq 124 ]; then echo "TIMEOUT {}"
    else echo "$r" | grep -E "^(PASS|FAIL)" || echo "ERROR {} rc=$rc"
    fi'
