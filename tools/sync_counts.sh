#!/usr/bin/env bash
# Regenerate the doc-cited counts from the artifacts themselves:
#   - ScalaTest case count: from an actual `sbt test` run
#   - query / oracle counts: from SparkEntry (graft.Counts)
# then rewrite the three number-bearing doc lines in place. Run from the
# repo root after adding queries or tests; commit the doc diff it makes.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "running sbt test (also verifies green)..." >&2
TESTS=$(sbt -batch test 2>&1 | tee /tmp/sync_counts_test.log |
  grep -oE "Total number of tests run: [0-9]+" | tail -1 | grep -oE "[0-9]+$")
grep -q "All tests passed." /tmp/sync_counts_test.log ||
  { echo "test suite not green — aborting doc sync" >&2; exit 1; }

QUERIES=$(sbt -batch "runMain graft.Counts" 2>&1 |
  grep -oE "queries=[0-9]+" | head -1 | grep -oE "[0-9]+")
ORACLES=$(sbt -batch "runMain graft.Counts" 2>&1 |
  grep -oE "oracle_backed=[0-9]+" | head -1 | grep -oE "[0-9]+")

echo "tests=$TESTS queries=$QUERIES oracles=$ORACLES"

sed -i -E "s/- [0-9]+ queries: \*\*[0-9]+\/[0-9]+ oracle-backed/- $QUERIES queries: **$ORACLES\/$ORACLES oracle-backed/" COVERAGE.md
sed -i -E "s/- [0-9]+ ScalaTest cases:/- $TESTS ScalaTest cases:/" COVERAGE.md
sed -i -E "s/Every one of the [0-9]+ oracle-checked queries/Every one of the $ORACLES oracle-checked queries/" README.md

# Driver artifact: the per-round CORRECTNESS_r*.json is the HARD signal —
# the docs must carry its tally verbatim, not just the local harness's.
# Rewrite the driver-artifact lines from the newest artifact, then fail
# if either anchor line went missing (deleting it is how an overclaim
# would sneak back in).
ART=$(ls CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1 || true)
if [ -n "$ART" ]; then
  read -r DGREEN DTOTAL <<<"$(python3 - "$ART" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
qs = d["queries"] if isinstance(d.get("queries"), dict) else d
green = sum(1 for v in qs.values() if isinstance(v, dict)
            and v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match"))
print(green, len(qs))
EOF
)"
  RND=$(echo "$ART" | grep -oE "[0-9]+" | head -1 | sed 's/^0*//')
  echo "driver artifact: $ART -> $DGREEN/$DTOTAL green"
  sed -i -E "s/- driver artifact: [0-9]+\/[0-9]+ green in CORRECTNESS_r[0-9]+\.json/- driver artifact: $DGREEN\/$DTOTAL green in CORRECTNESS_r$RND.json/" COVERAGE.md
  perl -0pi -e "s/the driver's latest artifact\s+records \d+\/\d+ green \(CORRECTNESS_r\d+\.json\)/the driver's latest artifact\nrecords $DGREEN\/$DTOTAL green (CORRECTNESS_r$RND.json)/" README.md
  grep -q "driver artifact: $DGREEN/$DTOTAL green in CORRECTNESS_r$RND.json" COVERAGE.md ||
    { echo "COVERAGE.md lost its driver-artifact line — restore it" >&2; exit 1; }
  grep -qE "records $DGREEN/$DTOTAL green \(CORRECTNESS_r$RND\.json\)" README.md ||
    { echo "README.md lost its driver-artifact line — restore it" >&2; exit 1; }
fi

# SCALE.md cites the oracle tally inline as "N/N green oracle rows" /
# "(N/N)" — rewrite EQUAL-pair literals only (a backreference pins X/X; a
# legitimate partial tally like "169/171 green" must never be rewritten to
# fully-green), then FAIL if a stale X/X (same number twice, not the
# current tally) survives anywhere in the three docs: a silent stale count
# is how the round-10 "(169/169)" drifted. grep -o extracts each match so
# a stale literal sharing a LINE with a current one still surfaces.
# (Backreferences in ERE are GNU sed/grep behavior — fine here, the
# toolchain container is GNU; revisit if this ever runs elsewhere.)
sed -i -E "s/([0-9]+)\/\1 green oracle rows/$ORACLES\/$ORACLES green oracle rows/g" SCALE.md
STALE=$(grep -noE "\b([0-9]{2,})/\1\b" SCALE.md COVERAGE.md README.md |
  grep -vE ":$ORACLES/$ORACLES\$" || true)
if [ -n "$STALE" ]; then
  echo "stale count-shaped literals (fix or re-point at the tally):" >&2
  echo "$STALE" >&2
  exit 1
fi

echo "doc lines now:"
grep -nE "queries: \*\*|ScalaTest cases:" COVERAGE.md
grep -nE "oracle-checked queries" README.md
grep -nE "green oracle rows" SCALE.md
