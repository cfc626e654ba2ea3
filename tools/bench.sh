#!/bin/bash
# Bench invocation with a machine-parseable tail: the LAST line of
# stdout is the summary JSON record (no sbt decoration).
#
#   tools/bench.sh [sf_dir] [cpus]
#
# Two layers guarantee the clean tail:
#  - build.sbt sets `run / outputStrategy := StdoutOutput` (forked
#    program stdout passes through without the "[info] " prefix) and
#    `showSuccess := false` (no "[success] Total time" footer), so even
#    a plain `sbt "runMain graft.Bench"` now ends with the JSON line;
#  - this wrapper additionally runs sbt at -error verbosity and strips
#    any residual non-JSON lines, so the stream is JSON-only.
#
# Detail records (per-run medians, cold-build attribution) land in
# BENCH_LOCAL.json / BENCH_SUMMARY.json in the CWD as before.
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
CPUS="${2:-32}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch -error "runMain graft.Bench" 2>/dev/null | grep '^{'
