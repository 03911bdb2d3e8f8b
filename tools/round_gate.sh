#!/bin/sh
# Per-round gates, each recorded as a committed artifact at the repo root:
#
#  1. Oracle TYPE gate: dumps every oracle via Verify --oracles-only (no
#     Spark execution), sweeps the DuckDB output types against
#     tools/check.py's allowlist -> TYPES_r<round>.txt. An uncast sum()
#     (DuckDB widens BIGINT sums to HUGEINT and the driver hash-compare
#     then diverges despite integer-equal values) can never silently
#     reach the driver again.
#  2. SCALE gate: runs graft.ScaleSmoke (replicated-corpus growth probes
#     with hard `require` bounds: featurizer/minhash/CC/bloom linearity,
#     containment + embedding-dedup candidate linearity, IVF probed-row
#     sub-linearity) -> SCALE_r<round>.txt. A super-linear candidate
#     join or re-linearized index fails the gate instead of waiting for
#     a judge audit.
#
# usage: tools/round_gate.sh <round> [sfDir] [scaleSfDir]
set -e
round="${1:?usage: tools/round_gate.sh <round> [sfDir] [scaleSfDir]}"
sf="${2:-/root/testdata/sf0.01}"
scale_sf="${3:-/root/testdata/sf0.1}"
out="$(mktemp -d)"
sbt -batch "runMain graft.Verify $sf $out --oracles-only" >/dev/null 2>&1
# No pipe here: POSIX sh has no pipefail, so `... | tee` would make the
# gate's exit status tee's and a FAILing sweep would still exit 0.
python3 tools/check.py --types "$sf" "$out" > "TYPES_r${round}.txt"
cat "TYPES_r${round}.txt"

# ScaleSmoke writes its probe lines to stdout; keep only the [scale]
# lines in the artifact. Capture the exit status explicitly (again: no
# pipefail in POSIX sh) so a failed growth bound fails the gate.
scale_log="$(mktemp)"
if sbt -batch "runMain graft.ScaleSmoke $scale_sf" >"$scale_log" 2>&1; then
  scale_rc=0
else
  scale_rc=$?
fi
grep '^\[scale\]' "$scale_log" > "SCALE_r${round}.txt" || true
if [ "$scale_rc" -ne 0 ]; then
  echo "SCALE GATE FAILED (rc=$scale_rc); tail of log:" >> "SCALE_r${round}.txt"
  tail -n 20 "$scale_log" >> "SCALE_r${round}.txt"
  cat "SCALE_r${round}.txt"
  exit "$scale_rc"
fi
echo "SCALE GATE PASS" >> "SCALE_r${round}.txt"
cat "SCALE_r${round}.txt"
