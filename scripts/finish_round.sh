#!/bin/bash
# End-of-round hygiene (round-4 verdict item 8): regenerate every derived
# artifact from the current benchmark JSONs, re-run bench + the full test
# suite, and commit the lot — so the committed tree can never again tell a
# parity story older than the round's own results (round-3 and round-4
# finding). Run when the chip is otherwise idle.
set -u
cd "$(dirname "$0")/.."
rc_all=0

step() {
  echo "=== $1 ==="
  shift
  "$@"
  local rc=$?
  [ $rc -ne 0 ] && { echo "step FAILED rc=$rc"; rc_all=1; }
  return 0
}

step "regen Table-2"      python scripts/make_table2.py
step "regen parity report" python scripts/make_parity.py
step "bench (TPU)"         python bench.py
step "full test suite"     timeout 5400 python -m pytest tests/ -q

step "commit artifacts" bash -c '
  # Add per-file: a single git add aborts and stages NOTHING if any one
  # listed path is missing, which would silently skip the hygiene commit.
  # Commit with the same pathspec so a concurrently staged file from another
  # auto-committer can never be swept into this commit (ADVICE r4).
  files=()
  for f in docs/TABLE2.md docs/PARITY.md benchmarks/bench_history.json \
      benchmarks/reference_measured.json benchmarks/experiments.json \
      benchmarks/table2_sweep.json BASELINE.json; do
    [ -e "$f" ] && files+=("$f") && git add -- "$f"
  done
  if ! git diff --cached --quiet -- "${files[@]}"; then
    git commit -q -m "round hygiene: refresh derived artifacts (table2/parity/bench history)" -- "${files[@]}"
  else
    echo "nothing to commit"
  fi'

echo "=== finish_round done (rc_all=$rc_all) ==="
exit $rc_all
