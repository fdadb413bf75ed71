"""Break down where the sequenced train-step's ~400 s TPU compile goes.

Round-3 finding: the identical StableHLO graph (2,834 lines) compiles in
~2 s on XLA:CPU but ~398 s on the (axon-tunneled) TPU backend
(bench_extended.json train_compile_epoch_s), while the collated regime's
train step compiles in ~10 s. The asymmetry is therefore TPU-backend- (or
compile-service-) specific, not trace-size. This probe times lower() and
compile() separately for the train/val/eval steps so the expensive program
is identified, and can A/B structural variants:

  python benchmarks/compile_probe.py [--baseline stgcnn] [--dataset hotel]
      [--no-cache]      # bypass the persistent compilation cache
      [--dump DIR]      # XLA pass-level dump (--xla_dump_to)

Run only when the chip is idle (one TPU process at a time).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default="stgcnn")
    ap.add_argument("--dataset", default="hotel")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--dump", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (probe HLO size / lowering "
                         "without touching a busy or unreachable TPU)")
    ap.add_argument("--micro", type=int, default=None,
                    help="override cfg.micro_batches: probes the per-chunk "
                         "grad program (bit-identical training, B/M-sized "
                         "compiled graph) as a cold-start mitigation A/B")
    ap.add_argument("--batch", type=int, default=None,
                    help="override cfg.batch_size: A/B whether TPU compile "
                         "time scales with the vmapped scene width")
    ap.add_argument("--scan", type=int, default=None,
                    help="override cfg.scan_chunks: probes the lax.scan "
                         "grad-accumulation step (one dispatch, chunk-sized "
                         "compiled body) as the cold-compile mitigation")
    args = ap.parse_args()

    if args.no_cache:
        os.environ["ET_JAX_CACHE_DIR"] = "off"
    if args.dump:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_dump_to={args.dump}")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eigentrajectory_tpu.config import load_config
    from eigentrajectory_tpu.data.batching import (CollatedBatcher,
                                                   SceneBatcher,
                                                   max_collated_peds)
    from eigentrajectory_tpu.train.trainer import ETJaxTrainer

    overrides = {}
    if args.micro is not None:
        overrides["micro_batches"] = args.micro
    if args.batch is not None:
        overrides["batch_size"] = args.batch
    if args.scan is not None:
        overrides["scan_chunks"] = args.scan
    cfg = load_config(
        f"configs/eigentrajectory-{args.baseline}-{args.dataset}.json",
        checkpoint_dir="/tmp/et_compile_probe", **overrides)
    tr = ETJaxTrainer(cfg, tag="cprobe", test_mode=False)
    tr.init_descriptor()
    print("backend:", jax.default_backend())

    step = tr._build_train_step()
    if tr.batching == "sequenced":
        b = next(iter(SceneBatcher(tr.data_train, cfg.batch_size, False, tr.n_max)))
        bargs = (jnp.asarray(b.obs), jnp.asarray(b.pred),
                 jnp.asarray(b.ped_valid), jnp.asarray(b.scene_valid))
    else:
        b = next(iter(CollatedBatcher(
            tr.data_train, cfg.batch_size, False, tr.p_max, drop_last=True)))
        bargs = (jnp.asarray(b.obs), jnp.asarray(b.pred),
                 jnp.asarray(b.ped_valid), jnp.asarray(b.scene_ids))
    extra = (tr.et, tr._sd)  # et/static_dist are runtime args (cache sharing)
    if hasattr(step, "jitted") or hasattr(step, "lower"):
        full = (tr.params, tr.batch_stats, tr.opt_state) + bargs + (
            jax.random.PRNGKey(0),) + extra
        step = getattr(step, "jitted", step)
        label = "train_step"
    else:
        # Micro-batched trainers return a plain-Python wrapper whose compiled
        # unit is the per-chunk grad program — probe that (it is exactly the
        # graph whose size motivated micro-batching in the first place).
        m = step.micro_batches
        chunk = bargs[0].shape[0] // m
        rngs = jax.random.split(jax.random.PRNGKey(0), bargs[0].shape[0])
        full = (tr.params, tr.batch_stats) + tuple(
            a[:chunk] for a in bargs) + (rngs[:chunk],) + extra
        step = step.grad_fn
        label = f"grad_fn(1/{m})"

    t0 = time.perf_counter()
    low = step.lower(*full)
    t1 = time.perf_counter()
    comp = low.compile()
    t2 = time.perf_counter()
    print(f"{label}  lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s  "
          f"hlo_lines {low.as_text().count(chr(10))}")
    del comp

    for name, build in (("val_step", tr._build_val_step),):
        fn = build()
        fn = getattr(fn, "jitted", fn)
        t0 = time.perf_counter()
        low = fn.lower(tr.params, tr.batch_stats, *bargs, *extra)
        t1 = time.perf_counter()
        low.compile()
        t2 = time.perf_counter()
        print(f"{name:10s}  lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s  "
              f"hlo_lines {low.as_text().count(chr(10))}")


if __name__ == "__main__":
    main()
