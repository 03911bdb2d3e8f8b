#!/bin/sh
# Per-round oracle TYPE gate: dumps every oracle via Verify
# --oracles-only (no Spark execution), sweeps the DuckDB output types
# against tools/check.py's allowlist, and records the result as
# TYPES_r<round>.txt at the repo root — a committed per-round artifact,
# so an uncast sum() (DuckDB widens BIGINT sums to HUGEINT and the
# driver hash-compare then diverges despite integer-equal values) can
# never silently reach the driver again.
#
# usage: tools/round_gate.sh <round> [sfDir]
set -e
round="${1:?usage: tools/round_gate.sh <round> [sfDir]}"
sf="${2:-/root/testdata/sf0.01}"
out="$(mktemp -d)"
sbt -batch "runMain graft.Verify $sf $out --oracles-only" >/dev/null 2>&1
# No pipe here: POSIX sh has no pipefail, so `... | tee` would make the
# gate's exit status tee's and a FAILing sweep would still exit 0.
python3 tools/check.py --types "$sf" "$out" > "TYPES_r${round}.txt"
cat "TYPES_r${round}.txt"
