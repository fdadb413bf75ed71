#!/bin/bash
# Round-5 chip queue: complete the eth seed-spread column. Runs a seed-1
# experiment for every baseline that does not yet have one (the eth split is
# the hardest and the one cell-consistency arguments lean on most;
# VERDICT r4 weak-3). Serial — one chip. Each cell: train -> eval/record ->
# scoped commit (ADVICE r4: always commit with a pathspec).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/eth_seed_queue
mkdir -p "$LOG"

chip_lock() {
  # Mutex across queue scripts: chip_quiet alone races (two queues can both
  # observe 3 quiet checks before either spawns trainval). mkdir is atomic;
  # the PID inside lets a human clear a stale lock after a crash/reboot.
  # Idempotent: per-cell calls return immediately once this script holds it.
  [ "$(cat /tmp/chip_queue.lock/pid 2>/dev/null)" = "$$" ] && return 0
  while ! mkdir /tmp/chip_queue.lock 2>/dev/null; do sleep 30; done
  echo $$ > /tmp/chip_queue.lock/pid
  trap 'rm -rf /tmp/chip_queue.lock' EXIT
}

chip_quiet() {
  # Require 3 consecutive quiet checks so we never start mid-handoff between
  # another queue's trainval and its record_experiment step.
  local n=0
  while [ $n -lt 3 ]; do
    if ps -eo cmd | grep -E "[c]ompile_probe|[b]ench_extended|[t]rainval|[r]ecord_experiment|[w]arm_cache" >/dev/null; then
      n=0; sleep 30
    else
      n=$((n + 1)); sleep 30
    fi
  done
}

run_cell() {
  local baseline=$1
  local name="$baseline-eth-seed1"
  if python - "$name" <<'EOF'
import json, sys
t = json.load(open('benchmarks/experiments.json'))
sys.exit(0 if sys.argv[1] in t else 1)
EOF
  then
    echo "[$(date +%H:%M:%S)] $name already recorded, skip" >> "$LOG/queue.log"
    return 0
  fi
  chip_lock
  chip_quiet
  echo "[$(date +%H:%M:%S)] starting $name" >> "$LOG/queue.log"
  python trainval.py --cfg "configs/experiments/$name.json" \
      --tag "expt-$name" > "$LOG/$name.log" 2>&1 \
  && python scripts/record_experiment.py --name "$name" \
      --cfg "configs/experiments/$name.json" \
      --baseline "$baseline" --dataset eth --seed 1 --tag "expt-$name" \
      --notes "seed-1 eth run (completing the all-baselines eth seed-spread column)" \
      >> "$LOG/$name.log" 2>&1 \
  && git add -- benchmarks/experiments.json "configs/experiments/$name.json" \
  && git commit -q -m "Record $name experiment (eth seed-spread evidence)" \
      -- benchmarks/experiments.json "configs/experiments/$name.json"
  echo "[$(date +%H:%M:%S)] $name rc=$?" >> "$LOG/queue.log"
}

for b in stgcnn implicit lbebm gpgraphstgcnn agentformer; do
  run_cell "$b"
done
echo "[$(date +%H:%M:%S)] eth seed queue complete" >> "$LOG/queue.log"
