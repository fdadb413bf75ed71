"""Pre-populate the persistent XLA compilation cache for a set of configs.

The one axis where the eager-torch reference beats this framework is cold
start: the sequenced train step's BACKWARD pass is where the TPU backend's
compile time goes, and the cost cliff is steep in the compiled body's scene
width (benchmarks/compile_probe.py: 215 s at width 128, 178 s at width 32,
12.8 s at width 8; the forward-only val step is 6 s). The primary fix is
scan_chunks (default-on): `lax.scan` grad accumulation keeps the compiled
body at width <= 8 — ~19 s cold for the full step. This script is the
complementary mitigation: pay whatever compile remains once per baseline at
deploy time — the runtime-et refactor keys the executable on (baseline, shape
bucket) only, so one warm per baseline serves all five splits and every
re-run through `ET_JAX_CACHE_DIR` (tests/test_compile_cache_sharing.py).

Usage:
  python scripts/warm_cache.py                      # all 10 baselines
  python scripts/warm_cache.py --baselines stgcnn sgcn [--dataset hotel]

Run on an idle chip; each cold baseline takes ~2-5 min, cached ones seconds.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL = ["stgcnn", "sgcn", "pecnet", "agentformer", "lbebm", "dmrgcn",
       "gpgraphsgcn", "gpgraphstgcnn", "graphtern", "implicit"]


def warm_one(baseline: str, dataset: str) -> None:
    import jax
    import jax.numpy as jnp

    from eigentrajectory_tpu.config import load_config
    from eigentrajectory_tpu.data.batching import (CollatedBatcher,
                                                   SceneBatcher)
    from eigentrajectory_tpu.train.trainer import ETJaxTrainer

    cfg = load_config(
        f"configs/eigentrajectory-{baseline}-{dataset}.json",
        checkpoint_dir="/tmp/et_warm_cache")
    tr = ETJaxTrainer(cfg, tag="warm", test_mode=True)
    tr.init_descriptor()

    t0 = time.perf_counter()
    step = tr._build_train_step()
    if tr.batching == "sequenced":
        b = next(iter(SceneBatcher(tr.data_train, cfg.batch_size, False,
                                   tr.n_max)))
        bargs = (jnp.asarray(b.obs), jnp.asarray(b.pred),
                 jnp.asarray(b.ped_valid), jnp.asarray(b.scene_valid))
    else:
        b = next(iter(CollatedBatcher(tr.data_train, cfg.batch_size, False,
                                      tr.p_max, drop_last=True)))
        bargs = (jnp.asarray(b.obs), jnp.asarray(b.pred),
                 jnp.asarray(b.ped_valid), jnp.asarray(b.scene_ids))
    if hasattr(step, "grad_fn"):  # micro-batched wrapper: warm the chunk unit
        m = step.micro_batches
        chunk = bargs[0].shape[0] // m
        rngs = jax.random.split(jax.random.PRNGKey(0), bargs[0].shape[0])
        step.grad_fn.lower(tr.params, tr.batch_stats,
                           *(a[:chunk] for a in bargs), rngs[:chunk],
                           tr.et, tr._sd).compile()
    else:
        step.lower(tr.params, tr.batch_stats, tr.opt_state, *bargs,
                   jax.random.PRNGKey(0), tr.et, tr._sd).compile()
    t1 = time.perf_counter()
    tr._build_val_step().lower(tr.params, tr.batch_stats, *bargs,
                               tr.et, tr._sd).compile()
    t2 = time.perf_counter()
    tr.test()  # compiles (and trivially runs) the packed-eval lax.map program
    t3 = time.perf_counter()
    print(f"{baseline:14s} train {t1 - t0:6.1f}s  val {t2 - t1:6.1f}s  "
          f"eval {t3 - t2:6.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baselines", nargs="+", default=ALL)
    ap.add_argument("--dataset", default="hotel",
                    help="any split works: executables are shared across "
                         "splits of a baseline (runtime-et refactor)")
    args = ap.parse_args()
    for b in args.baselines:
        try:
            warm_one(b, args.dataset)
        except Exception as e:  # keep warming the rest
            print(f"{b}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
