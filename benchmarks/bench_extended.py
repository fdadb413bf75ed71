"""Extended benchmark: train + eval throughput for BOTH batching regimes.

Complements bench.py (the driver's single-line eval benchmark) per the
round-1 review: a train-epoch throughput number, per-step wall-clock
percentiles (StepTimer), a second config exercising the collated regime, and
an optional xprof trace artifact per regime.

Regimes:
  * sequenced — ET-STGCNN / hotel (one padded-scene block per step)
  * collated  — ET-PECNet / univ (ped-packed flat batches)

MFU note: these models are a few hundred KFLOPs per pedestrian — tiny enough
that a single scene batch cannot saturate the MXU, and wall-clock is dominated
by dispatch latency to the (tunneled) chip plus HBM traffic for the metrics
gather. MFU would measure the fraction of an idle systolic array and say
nothing actionable, so this benchmark reports step time and trajectories/sec,
the quantities the reference comparison (and serving) actually care about.

Usage: python benchmarks/bench_extended.py [--trace] [--out PATH]
Writes benchmarks/bench_extended.json and prints one JSON line per metric.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGIMES = [
    # scan_chunks=1 pins the UNROLLED whole-batch step: since scan_chunks=0
    # (auto, the config default) now resolves to chunked lax.scan at
    # batch_size=128, the A/B below needs the unrolled arm pinned explicitly.
    ("stgcnn", "hotel", "sequenced", {"scan_chunks": 1}),
    ("pecnet", "univ", "collated", {}),
    # Cold-compile mitigation A/B: same model/data as "sequenced" but with
    # device-side lax.scan grad accumulation (only the chunk body compiles;
    # compile probe: 19 s vs 215 s). Records the steady-state epoch cost of
    # the scan so the compile/runtime trade stays visible.
    ("stgcnn", "hotel", "sequenced_scan16", {"scan_chunks": 16}),
]


def bench_regime(baseline: str, dataset: str, trace_dir=None, overrides=None):
    import jax

    from eigentrajectory_tpu.config import load_config
    from eigentrajectory_tpu.train.trainer import ETJaxTrainer
    from eigentrajectory_tpu.utils.profiling import StepTimer, start_trace, stop_trace

    cfg = load_config(f"configs/eigentrajectory-{baseline}-{dataset}.json",
                      checkpoint_dir="/tmp/et_tpu_bench_ext",
                      **(overrides or {}))
    tr = ETJaxTrainer(cfg, tag="benchx", test_mode=False)
    tr.init_descriptor()

    n_test_peds = int(tr.data_test.num_peds_in_seq.sum())
    n_train_peds = int(tr.data_train.num_peds_in_seq.sum())

    # --- train throughput: epoch 0 compiles, epochs 1-2 are steady state ---
    tr.step_timer = StepTimer()
    t0 = time.perf_counter()
    tr.train(0)
    compile_train_s = time.perf_counter() - t0
    tr.step_timer = StepTimer()  # drop compile-epoch samples
    times = []
    for epoch in (1, 2):
        t0 = time.perf_counter()
        if trace_dir and epoch == 2:
            start_trace(os.path.join(trace_dir, "train"))
        tr.train(epoch)
        if trace_dir and epoch == 2:
            stop_trace()
        times.append(time.perf_counter() - t0)
    train_epoch_s = min(times)
    step_stats = tr.step_timer.summary()

    # --- eval throughput: full test() loop (metrics included) ---
    tr.test()  # compile + warmup
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        if trace_dir and i == 2:
            start_trace(os.path.join(trace_dir, "eval"))
        tr.test()
        if trace_dir and i == 2:
            stop_trace()
        times.append(time.perf_counter() - t0)
    eval_s = min(times)

    return {
        "baseline": baseline,
        "dataset": dataset,
        "batching": tr.batching,
        "device": str(jax.devices()[0].platform),
        "train_epoch_s": round(train_epoch_s, 4),
        "train_traj_per_s": round(n_train_peds / train_epoch_s, 2),
        "train_compile_epoch_s": round(compile_train_s, 2),
        "train_step_stats_s": {k: round(v, 5) for k, v in step_stats.items()},
        "eval_s": round(eval_s, 4),
        "eval_traj_per_s": round(n_test_peds / eval_s, 2),
        "n_train_peds": n_train_peds,
        "n_test_peds": n_test_peds,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="capture one xprof trace per regime under benchmarks/traces/")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    out_path = args.out or os.path.join(here, "bench_extended.json")

    results = {}
    for baseline, dataset, regime, overrides in REGIMES:
        # Key traces on the regime name: 'sequenced' and 'sequenced_scan16'
        # share baseline-dataset, and the A/B profiles must stay separable.
        trace_dir = (os.path.join(here, "traces", regime)
                     if args.trace else None)
        r = bench_regime(baseline, dataset, trace_dir, overrides)
        results[regime] = r
        print(json.dumps(r), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
