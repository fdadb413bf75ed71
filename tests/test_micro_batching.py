"""Host-side gradient micro-batching == whole-batch step (identical math)."""
import numpy as np
import jax

from eigentrajectory_tpu.config import ExpConfig
from eigentrajectory_tpu.train.trainer import ETJaxTrainer
from tests.test_trainer import _synthetic_data


def test_micro_batching_matches_full_batch(tmp_path):
    def build(micro):
        cfg = ExpConfig(baseline="stgcnn", batch_size=8, micro_batches=micro,
                        checkpoint_dir=str(tmp_path), dataset="synthetic")
        data = tuple(_synthetic_data(np.random.default_rng(1), n_scenes=16)
                     for _ in range(3))
        tr = ETJaxTrainer(cfg, tag=f"micro{micro}", test_mode=True, datasets=data)
        tr.init_descriptor()
        for epoch in range(3):
            tr.train(epoch)
        return tr

    full = build(1)
    micro = build(4)
    # Losses identical up to float reassociation of the chunked grad sum
    # (AdamW's 1/sqrt(v) amplifies reassociation noise in raw params, so the
    # loss trajectory is the well-conditioned equivalence check).
    np.testing.assert_allclose(full.log["train_loss"], micro.log["train_loss"],
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(micro.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-2)


def test_micro_batching_identical_with_active_dropout(tmp_path):
    """DMRGCN's DropEdge (p=0.8) is active in training; per-scene RNG keys are
    split once from the step key and sliced per chunk, so micro_batches=2 is
    bit-identical (up to grad-sum reassociation) to the full-batch step EVEN
    with live dropout streams."""
    def build(micro):
        cfg = ExpConfig(baseline="dmrgcn", batch_size=4, micro_batches=micro,
                        checkpoint_dir=str(tmp_path), dataset="synthetic")
        data = tuple(_synthetic_data(np.random.default_rng(2), n_scenes=8)
                     for _ in range(3))
        tr = ETJaxTrainer(cfg, tag=f"mdrop{micro}", test_mode=True, datasets=data)
        tr.init_descriptor()
        for epoch in range(2):
            tr.train(epoch)
        return tr

    full = build(1)
    micro = build(2)
    np.testing.assert_allclose(full.log["train_loss"], micro.log["train_loss"],
                               rtol=2e-4)


def test_scan_chunks_matches_micro_and_full(tmp_path):
    """Device-side lax.scan accumulation (scan_chunks=M) reproduces the
    host-side micro_batches=M step EXACTLY (same key slicing, same
    left-to-right summation order — losses match to float equality) and the
    full-batch step up to grad-sum reassociation. This is the cold-compile
    mitigation path: only the chunk body is compiled."""
    def build(**kw):
        cfg = ExpConfig(baseline="stgcnn", batch_size=8,
                        checkpoint_dir=str(tmp_path), dataset="synthetic",
                        **kw)
        data = tuple(_synthetic_data(np.random.default_rng(1), n_scenes=16)
                     for _ in range(3))
        tag = "-".join(f"{k}{v}" for k, v in kw.items()) or "plain"
        tr = ETJaxTrainer(cfg, tag=f"scan-{tag}", test_mode=True,
                          datasets=data)
        tr.init_descriptor()
        for epoch in range(3):
            tr.train(epoch)
        return tr

    scan = build(scan_chunks=4)
    micro = build(micro_batches=4)
    full = build(scan_chunks=1)
    # scan == micro: identical summation order -> loss float-equality.
    # (Params still drift at reassociation scale: XLA fuses the scan body
    # differently than the standalone grad_fn, and AdamW's 1/sqrt(v)
    # amplifies that — same conditioning caveat as the micro-vs-full test.)
    np.testing.assert_allclose(scan.log["train_loss"],
                               micro.log["train_loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(scan.params),
                    jax.tree_util.tree_leaves(micro.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-2)
    # scan == full: up to chunked-sum reassociation
    np.testing.assert_allclose(scan.log["train_loss"],
                               full.log["train_loss"], rtol=2e-4)


def test_scan_chunks_auto_default(tmp_path):
    """scan_chunks=0 (the default) auto-resolves to chunk width <= 8: at
    batch_size=16 it must reproduce an explicit scan_chunks=2 run to float
    equality (same path), and at batch_size=8 (not > 8) it must stay on the
    unrolled step, float-equal to an explicit scan_chunks=1 run."""
    def build(**kw):
        bs = kw.get("batch_size", 8)
        cfg = ExpConfig(baseline="stgcnn", checkpoint_dir=str(tmp_path),
                        dataset="synthetic", **kw)
        data = tuple(_synthetic_data(np.random.default_rng(3), n_scenes=2 * bs)
                     for _ in range(3))
        tag = "auto-" + "-".join(f"{k}{v}" for k, v in kw.items())
        tr = ETJaxTrainer(cfg, tag=tag, test_mode=True, datasets=data)
        tr.init_descriptor()
        for epoch in range(2):
            tr.train(epoch)
        return tr

    auto16 = build(batch_size=16)
    explicit16 = build(batch_size=16, scan_chunks=2)
    np.testing.assert_allclose(auto16.log["train_loss"],
                               explicit16.log["train_loss"], rtol=1e-6)

    auto8 = build(batch_size=8)
    unrolled8 = build(batch_size=8, scan_chunks=1)
    np.testing.assert_allclose(auto8.log["train_loss"],
                               unrolled8.log["train_loss"], rtol=1e-6)
