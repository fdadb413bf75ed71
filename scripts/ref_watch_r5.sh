#!/bin/bash
# Round-5 follow-on queue: waits for the in-flight sgcn-zara1 reference run
# (PID $1), then runs dmrgcn-eth (new evidence for the weakest Table-2 cell)
# before agentformer-zara2 (whose from-scratch restart cannot reach the
# ep-128 LR step inside this round anyway — it only accumulates epochs for a
# later mid-training snapshot eval).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/ref_queue_r5
mkdir -p "$LOG"
SGCN_PID=${1:?usage: ref_watch_r5.sh <sgcn_pid>}

while kill -0 "$SGCN_PID" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] sgcn-zara1 (pid $SGCN_PID) finished" >> "$LOG/queue.log"

run() {
  local baseline=$1 dataset=$2
  echo "[$(date +%H:%M:%S)] starting $baseline-$dataset" >> "$LOG/queue.log"
  nice -n 15 python benchmarks/train_reference.py \
    --baseline "$baseline" --dataset "$dataset" --resume \
    > "$LOG/$baseline-$dataset.log" 2>&1
  echo "[$(date +%H:%M:%S)] $baseline-$dataset rc=$?" >> "$LOG/queue.log"
}

run dmrgcn eth
run agentformer zara2
echo "[$(date +%H:%M:%S)] follow-on queue complete" >> "$LOG/queue.log"
