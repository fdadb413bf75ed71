#!/usr/bin/env bash
# Evaluate one baseline over all five ETH-UCY splits (reference: script/test.sh).
set -e

baseline="stgcnn"
tag="EigenTrajectory-TPU"
config_dir="./configs"
datasets=(eth hotel univ zara1 zara2)

while getopts "b:t:c:d:" flag; do
  case "${flag}" in
    b) baseline=${OPTARG} ;;
    t) tag=${OPTARG} ;;
    c) config_dir=${OPTARG} ;;
    d) IFS=' ' read -r -a datasets <<< "${OPTARG}" ;;
    *) echo "usage: $0 [-b baseline] [-t tag] [-c config_dir] [-d \"eth hotel ...\"]"; exit 1 ;;
  esac
done

for d in "${datasets[@]}"; do
  cfg="${config_dir}/eigentrajectory-${baseline}-${d}.json"
  python trainval.py --cfg "${cfg}" --tag "${tag}" --test
done
