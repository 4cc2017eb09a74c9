#!/bin/bash
# Same-session A/B bench: run the SAME query set isolated (fresh JVM,
# min-of-3) against two compiled trees — the round-14 closing commit
# (side A, worktree .abwt) and HEAD (side B) — alternating A/B/A/B so
# slow host drift cancels. The round-15 verdict's reading rule: an
# isolated floor only adjudicates a mover against a SAME-SESSION
# baseline; this script IS that baseline.
#
# Usage: tools/ab_bench.sh <queries-csv> <sfDir> <rounds> <outPrefix>
set -u
Q="$1"; SF="$2"; ROUNDS="${3:-2}"; PREFIX="${4:-/tmp/ab}"
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do \
  echo --add-opens java.base/$p=ALL-UNNAMED; done)
run_side() { # $1=classes dir, $2=out json
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$Q" \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_FILE="$2" \
  java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx24g -cp "$1:/opt/spark/jars/*" graft.Bench >/dev/null 2>&1
}
for r in $(seq 1 "$ROUNDS"); do
  echo "round $r side A (r14 .abwt)" >&2
  run_side "/root/repo/.abwt/target/scala-2.13/classes" "${PREFIX}_A_$r.json"
  head -1 "${PREFIX}_A_$r.json"
  echo "round $r side B (HEAD)" >&2
  run_side "/root/repo/target/scala-2.13/classes" "${PREFIX}_B_$r.json"
  head -1 "${PREFIX}_B_$r.json"
done
