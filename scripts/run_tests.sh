#!/usr/bin/env bash
# Full suite, one pytest process PER FILE.
#
# Why: a single process accumulates XLA CPU compiler state across ~200 tests
# and eventually segfaults inside backend_compile_and_load (observed twice at
# ~45 min in, reproducible; any single file passes standalone). Per-file
# processes cap that state and give the same coverage.
#
# Usage: scripts/run_tests.sh [extra pytest args, e.g. -m "not slow"]
set -u
cd "$(dirname "$0")/.."
rc=0
for f in tests/test_*.py; do
    echo "=== $f"
    python -m pytest "$f" -q "$@" || rc=1
done
exit $rc
