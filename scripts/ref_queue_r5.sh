#!/bin/bash
# Round-5 measured-reference queue (VERDICT.md items 2 and 4).
#
# Runs the upstream reference (torch, CPU) sequentially on the single host
# CPU, nice'd so interactive work keeps priority. Each run snapshots every
# epoch (--resume) and auto-commits the snapshot every 16 epochs, so a VM
# reboot or round boundary loses at most 16 epochs. Steps are chained with
# per-step rc capture (round-4 advisor finding: the old queue reported only
# the last command's rc).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/ref_queue_r5
mkdir -p "$LOG"

run() {
  local baseline=$1 dataset=$2
  echo "[$(date +%H:%M:%S)] starting $baseline-$dataset" | tee -a "$LOG/queue.log"
  nice -n 15 python benchmarks/train_reference.py \
    --baseline "$baseline" --dataset "$dataset" --resume \
    > "$LOG/$baseline-$dataset.log" 2>&1
  local rc=$?
  echo "[$(date +%H:%M:%S)] $baseline-$dataset rc=$rc" | tee -a "$LOG/queue.log"
  return $rc
}

run sgcn zara1
run agentformer zara2
run dmrgcn eth
echo "[$(date +%H:%M:%S)] queue complete" | tee -a "$LOG/queue.log"
