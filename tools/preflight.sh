#!/usr/bin/env bash
# Preflight gate: refuse to snapshot a tree that does not compile and pass
# its test suite. Run before ANY end-of-round (or milestone) commit:
#
#   tools/preflight.sh            # compile + full test suite
#   tools/preflight.sh --fast     # compile only (mid-round WIP commits)
#
# Exit code 0 = safe to commit. Anything else = DO NOT COMMIT.
#
# Rationale (VERDICT round 4): the round-4 snapshot commit shipped a tree
# that failed `sbt compile` (one missing import), zeroing the round's
# driver gates. This script makes that class of failure impossible when
# honored; wire it into the round checklist before `git commit`.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--fast" ]]; then
  sbt -batch compile
else
  sbt -batch "compile; test"
fi
echo "PREFLIGHT OK — tree compiles$([[ "${1:-}" == "--fast" ]] || echo ' and 70+ tests pass'); safe to commit."
