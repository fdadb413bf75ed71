#!/bin/bash
# Round-4 chip queue (serial, single TPU): red-test evidence first, then the
# eval-throughput re-measurement, then the 7 remaining Table-2 cells.
# Launched detached (nohup) so it survives session restarts; logs in /tmp.
cd /root/repo || exit 1

echo "=== q1: graphtern-eth seed-1 (measured-reference band evidence) ==="
python trainval.py --cfg configs/experiments/graphtern-eth-seed1.json \
    --tag expt-graphtern-eth-seed1 > /tmp/q1_graphtern_seed1.log 2>&1
python scripts/record_experiment.py --name graphtern-eth-seed1 \
    --cfg configs/experiments/graphtern-eth-seed1.json \
    --baseline graphtern --dataset eth --seed 1 --tag expt-graphtern-eth-seed1 \
    --notes "seed-1 re-run for measured-reference band (r3 VERDICT item 2)" \
    >> /tmp/q1_graphtern_seed1.log 2>&1
echo "q1 done rc=$?"

echo "=== q2: bench_extended post-eval-rework re-measurement ==="
python benchmarks/bench_extended.py > /tmp/q2_bench_ext.log 2>&1
echo "q2 done rc=$?"

echo "=== q3: remaining Table-2 cells ==="
python scripts/sweep.py \
    --cells pecnet:hotel pecnet:zara1 pecnet:zara2 \
            agentformer:eth agentformer:hotel agentformer:univ agentformer:zara1 \
    --tag t2 --out benchmarks/table2_sweep.json > /tmp/q3_sweep.log 2>&1
echo "q3 done rc=$?"
