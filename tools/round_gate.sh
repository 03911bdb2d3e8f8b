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
python3 tools/check.py --types "$sf" "$out" | tee "TYPES_r${round}.txt"
