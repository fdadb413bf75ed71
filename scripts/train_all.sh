#!/usr/bin/env bash
# Train one baseline over all five ETH-UCY splits (reference: script/train.sh).
# On TPU the five runs share one chip sequentially by default; pass -p to
# background them (only sensible with multiple devices).
set -e

baseline="stgcnn"
tag="EigenTrajectory-TPU"
config_dir="./configs"
datasets=(eth hotel univ zara1 zara2)
parallel=0

while getopts "b:t:c:d:p" flag; do
  case "${flag}" in
    b) baseline=${OPTARG} ;;
    t) tag=${OPTARG} ;;
    c) config_dir=${OPTARG} ;;
    d) IFS=' ' read -r -a datasets <<< "${OPTARG}" ;;
    p) parallel=1 ;;
    *) echo "usage: $0 [-b baseline] [-t tag] [-c config_dir] [-d \"eth hotel ...\"] [-p]"; exit 1 ;;
  esac
done

pids=()
trap 'for p in "${pids[@]}"; do kill "$p" 2>/dev/null || true; done' INT TERM

for d in "${datasets[@]}"; do
  cfg="${config_dir}/eigentrajectory-${baseline}-${d}.json"
  echo "=== train ${baseline} on ${d} (${cfg}) ==="
  if [ "$parallel" = "1" ]; then
    python trainval.py --cfg "${cfg}" --tag "${tag}" &
    pids+=($!)
  else
    python trainval.py --cfg "${cfg}" --tag "${tag}"
  fi
done
wait
