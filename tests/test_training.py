"""Training loop tests, including on genuine reference feature files."""
import glob
import os

import numpy as np
import pytest

from medaka_tpu import training
from medaka_tpu.models import load_model

REF_TRAIN = "/root/reference/medaka/test/data/training_features.hdf5"


def test_clip_by_running_median():
    import jax.numpy as jnp

    import optax
    clip = training.clip_by_running_median(buffer_size=8, warmup=2)
    grads = {"w": jnp.ones((4,))}
    state = clip.init(grads)
    # feed consistent norms to build the buffer
    for _ in range(4):
        out, state = clip.update(grads, state)
        np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    # a 10x spike must be clipped to ~2x median
    spike = {"w": 10.0 * jnp.ones((4,))}
    out, state = clip.update(spike, state)
    norm = float(optax.global_norm(out))
    assert norm == pytest.approx(2.0 * 2.0, rel=1e-3)


def test_cosine_schedule_shape():
    sched = training.cosine_schedule(1e-3, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(100)) < 1e-4


class TestOnReferenceData:
    def test_batcher_reads_reference_features(self):
        b = training.TrainBatcher(
            [REF_TRAIN], validation=0.2, batch_size=8)
        assert b.time_steps == 500
        assert b.feat_dim == 10
        batch = next(b.batches("train"))
        assert batch["features"].shape == (8, 500, 10)
        assert batch["labels"].max() <= 4
        assert batch["mask"].sum() > 0

    def test_end_to_end_training_improves(self, tmp_path):
        """Two epochs of a small GRU on real medaka training features:
        loss must drop and checkpoints must round-trip."""
        b = training.TrainBatcher(
            [REF_TRAIN], validation=0.2, batch_size=16,
            max_samples=64, max_valid_samples=16)
        out = str(tmp_path / "train")
        model, params = training.run_training(
            out, b,
            model_dict={"type": "GRUModel", "kwargs": {
                "num_features": 10, "num_classes": 5, "gru_size": 16}},
            epochs=2, optimizer="adam",
            optim_args={"learning_rate": 5e-3},
            compute_dtype=None)
        csv_path = os.path.join(out, "training.csv")
        assert os.path.exists(csv_path)
        rows = open(csv_path).read().splitlines()
        first_loss = float(rows[1].split(",")[3])
        last_train = [r for r in rows if r.startswith("train,1")][-1]
        assert float(last_train.split(",")[3]) < first_loss
        # checkpoints exist and load with metadata from the HDF5
        ckpts = glob.glob(os.path.join(out, "model-*.tar.gz"))
        assert len(ckpts) >= 2
        bundle = load_model(os.path.join(out, "model-1.tar.gz"))
        assert bundle.model.gru_size == 16
        assert bundle.feature_encoder is not None
        assert bundle.label_scheme is not None
        probs = bundle.model.apply(
            bundle.params,
            np.zeros((1, 32, 10), np.float32))
        assert probs.shape == (1, 32, 5)


def test_samples_per_epoch_and_constant_lr(tmp_path):
    """Reference --samples_per_training_epoch / --use_lr_schedule flags.

    The epoch truncates at samples_per_epoch // batch_size batches and
    a constant-LR run still trains (reference ``medaka.py:551,560``).
    """
    b = training.TrainBatcher(
        [REF_TRAIN], validation=0.2, batch_size=16, max_samples=64)
    assert b.n_batches("train") > 2  # something to truncate
    out = str(tmp_path / "capped")
    training.run_training(
        out, b, epochs=1,
        model_dict={"type": "GRUModel", "kwargs": {"gru_size": 8}},
        samples_per_epoch=2 * 16, use_lr_schedule=False)
    rows = open(os.path.join(out, "training.csv")).read().splitlines()
    train_rows = [r for r in rows if r.startswith("train,")]
    assert len(train_rows) == 2


def test_amp_full_precision_conflict():
    """Explicit --amp with --full_precision is rejected, not ignored."""
    import argparse

    args = argparse.Namespace(
        features=[REF_TRAIN], validation_features=None,
        validation_split=0.2, seed=0, batch_size=16, max_samples=8,
        max_valid_samples=None, validate_only=False, model=None,
        train_name="unused", epochs=1, optimizer="adam", optim_args={},
        model_parallel=1, resume=False, samples_per_training_epoch=None,
        use_lr_schedule=True, amp=True, full_precision=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        training.train(args)


def test_training_reproducible(tmp_path):
    """Same seed -> bitwise-identical training curve."""
    losses = []
    for run in range(2):
        b = training.TrainBatcher(
            [REF_TRAIN], validation=0.2, seed=3, batch_size=16,
            max_samples=32)
        out = str(tmp_path / "run{}".format(run))
        training.run_training(
            out, b, epochs=1, seed=3,
            model_dict={"type": "GRUModel",
                        "kwargs": {"gru_size": 8}})
        with open(os.path.join(out, "training.csv")) as fh:
            losses.append(
                [r.split(",")[3] for r in fh.read().splitlines()[1:]])
    assert losses[0] == losses[1]


# ---------------------------------------------------------------------------
# read-level (LatentSpaceLSTM) training — the reference trains this family
# in-tree (``medaka/torch_ext.py:111-166``, ``training.py:440-458``,
# ``test/test_architectures.py:58-106``)
# ---------------------------------------------------------------------------

_RL_KWARGS = {"lstm_size": 8, "cnn_size": 8, "kernel_sizes": [1, 3],
              "use_dwells": False}

_ARCH_CASES = [
    ({"type": "GRUModel",
      "kwargs": {"num_features": 10, "gru_size": 8}}, "counts"),
    ({"type": "LatentSpaceLSTM", "kwargs": dict(_RL_KWARGS)}, "reads"),
    ({"type": "LatentSpaceLSTM",
      "kwargs": dict(_RL_KWARGS, bidirectional=False)}, "reads"),
    ({"type": "LatentSpaceLSTM",
      "kwargs": dict(_RL_KWARGS, use_dwells=True)}, "reads"),
]


def _random_batch(kind, use_dwells=False, B=4, T=16, R=6, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "counts":
        feats = rng.random((B, T, 10)).astype(np.float32)
    else:
        C = 5 if use_dwells else 4
        feats = np.zeros((B, T, R, C), np.int8)
        feats[..., 0] = rng.integers(0, 6, (B, T, R))
        feats[..., 1] = rng.integers(1, 40, (B, T, R))
        feats[..., 2] = rng.choice([-1, 1], (B, T, R))
        feats[..., 3] = 30
        if use_dwells:
            feats[..., 4] = rng.integers(1, 9, (B, T, R))
        # a couple of empty read rows to exercise masked pooling/BN
        feats[:, :, -1] = 0
    return {
        "features": feats,
        "labels": rng.integers(0, 5, (B, T)).astype(np.int32),
        "mask": np.ones((B, T), np.float32),
        "lengths": np.full((B,), T, np.int32)}


@pytest.mark.parametrize("model_dict,kind", _ARCH_CASES)
def test_train_step_per_architecture(model_dict, kind):
    """Every trainable architecture takes optimizer steps that reduce
    the loss on a fixed batch, and still runs inference afterwards
    (reference ``test_architectures.py:58-106``)."""
    import jax
    import jax.numpy as jnp

    from medaka_tpu import parallel
    from medaka_tpu.models import model_from_dict

    model = model_from_dict(model_dict)
    batch = _random_batch(
        kind, use_dwells=model_dict["kwargs"].get("use_dwells", False))
    mesh = parallel.make_mesh(jax.devices()[:1])
    opt = training.build_optimizer(
        "adam", optim_args={"learning_rate": 1e-2})
    params = parallel.shard_params(
        model.init_params(jax.random.PRNGKey(0)), mesh)
    opt_state = opt.init(params)
    step = parallel.make_train_step(model, opt, mesh, compute_dtype=None)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(6):
        params, opt_state, loss, n_c, n_t = step(params, opt_state, jbatch)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    probs = model.apply(params, jnp.asarray(batch["features"]))
    assert probs.shape == batch["labels"].shape + (5,)
    assert np.all(np.isfinite(np.asarray(probs)))


def test_read_level_train_step_bf16():
    """The bf16 train step (the TPU path) must differentiate through
    the f32-accumulating conv: JAX's conv transpose rule rejects a
    float32 cotangent against bfloat16 operands, so the model routes
    convs through a custom-VJP wrapper (``_conv1d_f32acc``). Loss and
    grads must stay finite and match the f32 step closely."""
    import jax
    import jax.numpy as jnp

    from medaka_tpu import parallel
    from medaka_tpu.models import model_from_dict

    model = model_from_dict(
        {"type": "LatentSpaceLSTM", "kwargs": _RL_KWARGS})
    batch = _random_batch("reads")
    params = model.init_params(jax.random.PRNGKey(0))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_at(dtype):
        def loss_fn(p):
            loss, _ = parallel.cross_entropy_loss(
                model, p, jbatch, compute_dtype=dtype, training=True)
            return loss
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        flat = np.concatenate([
            np.asarray(g, np.float32).ravel()
            for g in jax.tree_util.tree_leaves(grads)])
        return float(loss), flat

    loss16, g16 = loss_at(jnp.bfloat16)
    loss32, g32 = loss_at(None)
    assert np.isfinite(loss16) and np.all(np.isfinite(g16))
    assert abs(loss16 - loss32) < 0.05 * max(1.0, abs(loss32))
    # direction agreement: bf16 grads point the same way as f32
    cos = np.dot(g16, g32) / max(
        1e-9, np.linalg.norm(g16) * np.linalg.norm(g32))
    assert cos > 0.97


def _write_read_level_features(path, chunk_len=4, overlap=2):
    """Labelled read-level feature HDF5 from the mock 8 bp BAM."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from mock_data import create_simple_bam, create_truth_bam

    from medaka_tpu import datastore
    from medaka_tpu.common import Region
    from medaka_tpu.features import (
        ReadAlignmentFeatureEncoder, SampleGenerator)
    from medaka_tpu.labels import HaploidLabelScheme

    d = os.path.dirname(path)
    bam = create_simple_bam(os.path.join(d, "reads.bam"))
    truth = create_truth_bam(os.path.join(d, "truth.bam"))
    encoder = ReadAlignmentFeatureEncoder(
        include_dwells=False, max_reads=10)
    scheme = HaploidLabelScheme()
    gen = SampleGenerator(
        bam, Region("ref", 0, 8), encoder, truth_bam=truth,
        label_scheme=scheme, chunk_len=chunk_len, chunk_overlap=overlap,
        min_truth_length=0)
    samples = gen.samples
    assert len(samples) >= 3
    with datastore.DataStore(path, "w") as ds:
        ds.set_meta(encoder, "feature_encoder")
        ds.set_meta(scheme, "label_scheme")
        for s in samples:
            ds.write_sample(s)
        ds.write_registry()
    return path


class TestReadLevelTraining:
    def test_batcher_serves_4d_batches(self, tmp_path):
        feats = _write_read_level_features(str(tmp_path / "rl.hdf5"))
        b = training.TrainBatcher(
            [feats], validation=0.25, batch_size=2)
        assert b.is_read_level
        assert b.max_reads == 10  # encoder's static cap, not batch max
        batch = next(b.batches("train"))
        assert batch["features"].shape == (2, b.time_steps, 10, 4)
        assert batch["features"].dtype == np.int8
        assert batch["labels"].max() <= 4
        # host-side majority baseline rides with read-level batches
        assert batch["baseline_pred"].shape == (2, b.time_steps)
        # on the clean mock pileup, majority vote is mostly right
        agree = (batch["baseline_pred"] == batch["labels"]) * batch["mask"]
        assert agree.sum() / batch["mask"].sum() > 0.5

    def test_end_to_end_read_level_training(self, tmp_path):
        """`train` on read-level features: loss drops, BN running stats
        move off init, the checkpoint round-trips and predicts."""
        feats = _write_read_level_features(str(tmp_path / "rl.hdf5"))
        b = training.TrainBatcher([feats], validation=0.25, batch_size=2)
        out = str(tmp_path / "train")
        model, params = training.run_training(
            out, b,
            model_dict={"type": "LatentSpaceLSTM",
                        "kwargs": dict(_RL_KWARGS)},
            epochs=3, optimizer="adam",
            optim_args={"learning_rate": 5e-3}, compute_dtype=None)
        rows = open(os.path.join(out, "training.csv")).read().splitlines()
        header = rows[0].split(",")
        assert "baseline_acc" in header
        li = header.index("loss")
        train_rows = [r for r in rows[1:] if r.startswith("train,")]
        assert float(train_rows[-1].split(",")[li]) < \
            float(train_rows[0].split(",")[li])
        # BN running stats were updated by the train step
        bn = params["convs"][0]["bn"]
        assert np.abs(np.asarray(bn["mean"])).max() > 0
        assert np.abs(np.asarray(bn["var"]) - 1.0).max() > 1e-6
        bundle = load_model(os.path.join(out, "model-2.tar.gz"))
        assert type(bundle.model).__name__ == "LatentSpaceLSTM"
        assert bundle.feature_encoder.max_reads == 10
        probs = bundle.model.apply(
            bundle.params, np.zeros((1, 8, 10, 4), np.int8))
        assert probs.shape == (1, 8, 5)

    def test_default_model_is_read_level(self, tmp_path):
        """model_dict=None on a read-level batcher selects the
        LatentSpaceLSTM family (reference rl_lstm384 geometry) and a
        counts model is rejected outright."""
        feats = _write_read_level_features(str(tmp_path / "rl.hdf5"))
        b = training.TrainBatcher([feats], validation=0.25, batch_size=2)
        with pytest.raises(ValueError, match="read-level"):
            training.run_training(
                str(tmp_path / "bad"), b,
                model_dict={"type": "GRUModel", "kwargs": {}}, epochs=1)


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """Lossless resume: 2+2 epochs (resumed) == 4 epochs straight.

    The resume snapshot carries params AND optimizer state AND epoch,
    so the resumed run reproduces the uninterrupted loss curve exactly
    (reference medaka has no such path; its optimizer dump at
    ``training.py:189-191`` is write-only).
    """
    def make_batcher():
        return training.TrainBatcher(
            [REF_TRAIN], validation=0.2, seed=3, batch_size=16,
            max_samples=32, max_valid_samples=16)

    model_dict = {"type": "GRUModel", "kwargs": {"gru_size": 8}}
    kwargs = dict(
        model_dict=model_dict, optimizer="adam",
        optim_args={"learning_rate": 5e-3}, seed=3, compute_dtype=None)

    # uninterrupted run: 4 epochs
    full = str(tmp_path / "full")
    training.run_training(full, make_batcher(), epochs=4, **kwargs)

    # "killed" run: same 4-epoch job dies mid-epoch-2, then resumes
    part = str(tmp_path / "part")
    real_run_epoch = training.run_epoch
    calls = {"n": 0}

    def dying_run_epoch(*args, **kw):
        calls["n"] += 1
        if calls["n"] > 4:  # epochs 0+1 = 2 train + 2 validation passes
            raise RuntimeError("simulated kill -9")
        return real_run_epoch(*args, **kw)

    training.run_epoch = dying_run_epoch
    try:
        with pytest.raises(RuntimeError, match="simulated kill"):
            training.run_training(part, make_batcher(), epochs=4, **kwargs)
    finally:
        training.run_epoch = real_run_epoch
    assert os.path.exists(os.path.join(part, "resume.npz"))
    training.run_training(
        part, make_batcher(), epochs=4, resume=True, **kwargs)

    def curve(d):
        with open(os.path.join(d, "training.csv")) as fh:
            return [
                tuple(r.split(",")[:4])
                for r in fh.read().splitlines()[1:]]

    # the resumed epochs 2-3 match the uninterrupted run bitwise
    full_rows = [r for r in curve(full) if int(r[1]) >= 2]
    part_rows = [r for r in curve(part) if int(r[1]) >= 2]
    assert full_rows == part_rows

    # final checkpoints identical
    a = load_model(os.path.join(full, "model-3.tar.gz")).params
    b = load_model(os.path.join(part, "model-3.tar.gz")).params
    import jax
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
