#!/usr/bin/env bash
# Pre-snapshot gate: run before ANY end-of-round (or otherwise final)
# commit. Round 10 shipped a snapshot that did not compile because no
# automated check stood between "edit" and "commit"; this script is that
# check. It fails fast and loudly — a non-zero exit means DO NOT COMMIT.
#
#   tools/gate.sh          # compile + full ScalaTest + 4-query bench smoke
#   tools/gate.sh --quick  # compile + 4-query bench smoke (skip sbt test)
#
# Output tail is meant to be pasted into the snapshot commit message.
set -uo pipefail
cd "$(dirname "$0")/.."

fail() { echo "GATE FAIL: $1" >&2; exit 1; }

echo "== gate: sbt compile =="
sbt -batch compile 2>&1 | tail -3 | sed 's/^/  /'
[ "${PIPESTATUS[0]}" -eq 0 ] || fail "sbt compile"

if [ "${1:-}" != "--quick" ]; then
  echo "== gate: sbt test =="
  sbt -batch test 2>&1 | tail -6 | sed 's/^/  /'
  [ "${PIPESTATUS[0]}" -eq 0 ] || fail "sbt test"
fi

echo "== gate: 4-query bench smoke (sf0.001) =="
SMOKE=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=16 \
  tools/run.sh graft.Bench dedup_embed_keepers,margin_align_pairs,hybrid_rrf_topk,dup_graph_kcore \
  2>/dev/null | grep '"metric"' | tail -1)
[ -n "$SMOKE" ] || fail "bench smoke produced no JSON line"
echo "  $SMOKE"

echo "GATE OK"
