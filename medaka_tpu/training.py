"""Model training from feature HDF5 files.

Functional equivalent of the reference's ``medaka train``
(``medaka/training.py`` + ``medaka/torch_ext.py``) on the TPU stack:

- batches are fixed-shape ``{features, labels, mask, lengths}`` dicts fed
  to the mesh-sharded jitted train step (``parallel.make_train_step``) —
  data parallel over chunks, optional tensor parallel over gate dims;
- optimisation via optax: adam/nadam/rmsprop/sgd with the reference's
  default hyperparameters (``training.py:107-142``), linear-warmup cosine
  LR decay (warmup 500 steps, ``torch_ext.py:452-460``), and a
  running-median gradient clip mirroring the reference's quantile
  ``ClipGrad`` (buffer 100, 2x median, ``torch_ext.py:206-239``);
- per-epoch checkpoints ``model-{epoch}.tar.gz`` plus best-by-val-loss /
  best-by-val-accuracy, early stop after 20 epochs without improvement
  (``training.py:222-236``);
- metrics reported as accuracy and Q = -10 log10(1 - acc)
  (``torch_ext.py:258-272``) against the majority-vote baseline.
"""
from __future__ import annotations

import csv
import functools
import os
import threading
import queue as queue_mod
from timeit import default_timer as now
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medaka_tpu import common, datastore, parallel
from medaka_tpu import models as models_mod


def qscore(acc: float) -> float:
    """Accuracy as a phred-style Q score."""
    return float(-10 * np.log10(max(1e-9, 1.0 - acc)))


# ---------------------------------------------------------------------------
# gradient clipping: running-median analogue of the reference's ClipGrad
# ---------------------------------------------------------------------------


def clip_by_running_median(buffer_size: int = 100, factor: float = 2.0,
                           warmup: int = 5) -> optax.GradientTransformation:
    """Clip global norm to ``factor`` x median of the recent norms.

    Mirrors the reference's quantile ``ClipGrad`` (buffer 100, 2x median,
    ``torch_ext.py:206-239``) as a pure optax transformation whose state
    carries the norm ring buffer.
    """

    def init(params):
        del params
        return {
            "norms": jnp.zeros((buffer_size,), jnp.float32),
            "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        del params
        norm = optax.global_norm(updates).astype(jnp.float32)
        count = state["count"]
        n_valid = jnp.minimum(count, buffer_size)
        # median over the valid prefix: mask invalid slots to +inf and
        # take the midpoint of the sorted array
        masked = jnp.where(
            jnp.arange(buffer_size) < n_valid, state["norms"], jnp.inf)
        med = jnp.sort(masked)[jnp.maximum(0, (n_valid - 1) // 2)]
        limit = factor * med
        use_clip = count >= warmup
        scale = jnp.where(
            use_clip & (norm > limit) & jnp.isfinite(limit),
            limit / jnp.maximum(norm, 1e-12), 1.0)
        new_updates = jax.tree_util.tree_map(
            lambda u: u * scale.astype(u.dtype), updates)
        clipped_norm = jnp.minimum(
            norm, jnp.where(use_clip, limit, norm))
        new_state = {
            "norms": state["norms"].at[count % buffer_size].set(
                clipped_norm),
            "count": count + 1}
        return new_updates, new_state

    return optax.GradientTransformation(init, update)


_OPTIMIZERS = {
    # reference per-optimizer defaults (training.py:107-142)
    "adam": (optax.adam, {"learning_rate": 1e-4}),
    "nadam": (optax.nadam, {"learning_rate": 1e-4}),
    "rmsprop": (optax.rmsprop, {"learning_rate": 1e-3}),
    "sgd": (optax.sgd, {"learning_rate": 1e-3}),
}


def build_optimizer(name: str = "nadam", lr_schedule=None,
                    optim_args: Optional[Dict] = None,
                    clip: bool = True) -> optax.GradientTransformation:
    """Construct the optax chain (clip -> optimizer [-> schedule])."""
    factory, defaults = _OPTIMIZERS[name]
    kwargs = dict(defaults)
    if optim_args:
        kwargs.update(optim_args)
    if lr_schedule is not None:
        kwargs["learning_rate"] = lr_schedule
    chain = []
    if clip:
        chain.append(clip_by_running_median())
    chain.append(factory(**kwargs))
    return optax.chain(*chain)


def cosine_schedule(peak_lr: float, total_steps: int,
                    warmup_steps: int = 500):
    """Linear warmup + cosine decay (reference ``torch_ext.py:452-471``)."""
    warmup_steps = min(warmup_steps, max(1, total_steps // 10))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1))


# ---------------------------------------------------------------------------
# Batching from HDF5 sample files
# ---------------------------------------------------------------------------


class TrainBatcher:
    """Index feature files, split train/valid, serve fixed-shape batches.

    Reference: ``medaka/training.py:295-391``.
    """

    def __init__(self, features: Sequence[str], validation: float = 0.2,
                 seed: int = 0, batch_size: int = 128,
                 max_samples: Optional[int] = None,
                 max_valid_samples: Optional[int] = None):
        """:param features: HDF5 feature file paths.

        :param validation: fraction for validation, or a list of file
            paths to use exclusively for validation.
        """
        self.logger = common.get_named_logger("TrainBatcher")
        self.batch_size = batch_size
        if isinstance(validation, (list, tuple)):
            train_index = datastore.DataIndex(list(features))
            valid_index = datastore.DataIndex(list(validation))
            self.train_samples = list(train_index.samples)
            self.valid_samples = list(valid_index.samples)
            self._index = train_index
        else:
            index = datastore.DataIndex(list(features))
            samples = list(index.samples)
            rng = np.random.default_rng(seed)
            rng.shuffle(samples)
            n_valid = int(len(samples) * validation)
            self.valid_samples = samples[:n_valid]
            self.train_samples = samples[n_valid:]
            self._index = index
        if max_samples is not None:
            self.train_samples = self.train_samples[:max_samples]
        if max_valid_samples is not None:
            self.valid_samples = self.valid_samples[:max_valid_samples]
        if not self.train_samples:
            raise ValueError("No training samples found.")
        self.meta = dict(self._index.metadata)
        first = next(self._index.yield_from_feature_files(
            samples=self.train_samples[:1]))
        self.time_steps = first.features.shape[0]
        self.feat_dim = first.features.shape[-1]
        # read-level feature files hold (positions, reads, channels)
        # int8 tensors (reference trains LatentSpaceLSTM on these,
        # ``medaka/torch_ext.py:111-166``); batches get a STATIC reads
        # dim — the encoder's max_reads cap — so XLA compiles one
        # program shape per run (the reference instead pads to the
        # per-batch max depth).
        self.is_read_level = first.features.ndim == 3
        if self.is_read_level:
            fenc = self.meta.get("feature_encoder")
            self.max_reads = int(
                getattr(fenc, "max_reads", 0)
                or first.features.shape[1])
            self.logger.info(
                "%d train / %d valid read-level samples of shape "
                "(%d, <=%d, %d).",
                len(self.train_samples), len(self.valid_samples),
                self.time_steps, self.max_reads, self.feat_dim)
        else:
            self.max_reads = None
            self.logger.info(
                "%d train / %d valid samples of shape (%d, %d).",
                len(self.train_samples), len(self.valid_samples),
                self.time_steps, self.feat_dim)

    def _load(self, sample_names) -> Dict[str, np.ndarray]:
        if self.is_read_level:
            feats = np.zeros(
                (self.batch_size, self.time_steps, self.max_reads,
                 self.feat_dim), np.int8)
        else:
            feats = np.zeros(
                (self.batch_size, self.time_steps, self.feat_dim),
                np.float32)
        labels = np.zeros((self.batch_size, self.time_steps), np.int32)
        mask = np.zeros((self.batch_size, self.time_steps), np.float32)
        lengths = np.zeros((self.batch_size,), np.int32)
        baseline = (
            np.zeros((self.batch_size, self.time_steps), np.int32)
            if self.is_read_level else None)
        for i, sample in enumerate(self._index.yield_from_feature_files(
                samples=sample_names)):
            n = min(sample.features.shape[0], self.time_steps)
            if self.is_read_level:
                r = min(sample.features.shape[1], self.max_reads)
                feats[i, :n, :r] = sample.features[:n, :r]
                # majority-vote baseline precomputed host-side per
                # sample (the reference does the same in its loader
                # workers, ``medaka/training.py:440-458``): the exact
                # counts_matrix derivation needs the (major, minor)
                # position structure, which does not ride into the
                # device batch
                baseline[i, :n] = np.argmax(
                    sample.majority_vote_probs[:n], axis=-1)
            else:
                feats[i, :n] = sample.features[:n]
            labels[i, :n] = np.asarray(sample.labels[:n]).reshape(n)
            mask[i, :n] = 1.0
            lengths[i] = n
        out = {"features": feats, "labels": labels, "mask": mask,
               "lengths": lengths}
        if baseline is not None:
            out["baseline_pred"] = baseline
        return out

    def batches(self, split: str = "train", shuffle: bool = True,
                seed: int = 0, prefetch: int = 4):
        """Yield batch dicts for an epoch, loading in a worker thread."""
        names = list(
            self.train_samples if split == "train" else self.valid_samples)
        if shuffle:
            np.random.default_rng(seed).shuffle(names)
        groups = [
            names[i:i + self.batch_size]
            for i in range(0, len(names), self.batch_size)]
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=prefetch)
        stop = threading.Event()
        error = []

        def worker():
            try:
                for g in groups:
                    if stop.is_set():
                        return
                    batch = self._load(g)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except queue_mod.Full:
                            continue
            except Exception as e:
                # surface IO errors to the consumer — a silently
                # truncated epoch would train on partial data forever
                error.append(e)
            finally:
                while True:  # sentinel must land even when q is full
                    try:
                        q.put(None, timeout=0.2)
                        break
                    except queue_mod.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            # an abandoned generator (e.g. samples_per_training_epoch
            # truncation) must not leak a blocked loader thread
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue_mod.Empty:
                    break
            t.join(timeout=10)
        if error:
            raise error[0]

    def n_batches(self, split: str = "train") -> int:
        """Batches per epoch."""
        n = len(self.train_samples if split == "train"
                else self.valid_samples)
        return int(np.ceil(n / self.batch_size))


class CSVLogger:
    """Append-only CSV metrics log (reference ``training.py:480-531``)."""

    def __init__(self, path: str):
        self.path = path
        self._fieldnames: Optional[List[str]] = None
        self._fh = None

    def append(self, row: Dict):
        if self._fh is None:
            self._fieldnames = list(row.keys())
            exists = os.path.exists(self.path)
            self._fh = open(self.path, "a", newline="")
            self._writer = csv.DictWriter(
                self._fh, fieldnames=self._fieldnames)
            if not exists:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------


@functools.lru_cache(1)
def _baseline_fn():
    """Jitted majority-vote baseline, compiled once per process.

    Jitting inside run_epoch re-traced it every epoch (2 compilations
    per epoch over a 5000-epoch run).
    """
    return jax.jit(parallel.majority_baseline_accuracy)


def run_epoch(step_fn, params, opt_state, batcher, split, epoch,
              logger, csv_logger=None, is_training=True, eval_fn=None,
              max_batches=None):
    """One pass over a split; returns (params, opt_state, loss, acc).

    :param max_batches: truncate the epoch after this many batches
        (reference ``--samples_per_training_epoch``,
        ``torch_ext.py:run_epoch total_num_samples``).
    """
    total_loss, total_correct, total_count, n_batches = 0.0, 0.0, 0.0, 0
    base_correct = 0.0
    baseline_fn = _baseline_fn()
    is_counts = batcher.feat_dim == 10 and not batcher.is_read_level
    has_baseline = is_counts or batcher.is_read_level
    t0 = now()
    for batch in batcher.batches(split, shuffle=is_training, seed=epoch):
        if max_batches is not None and n_batches >= max_batches:
            break
        # host-side majority argmax for read-level batches (see
        # TrainBatcher._load); stays out of the jitted batch pytree
        host_baseline = batch.pop("baseline_pred", None)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        if is_training:
            params, opt_state, loss, n_c, n_t = step_fn(
                params, opt_state, jbatch)
        else:
            loss, (n_c, n_t) = eval_fn(params, jbatch)
        row = {
            "split": split, "epoch": epoch, "batch": n_batches + 1,
            "loss": float(loss),
            "acc": float(n_c) / max(1.0, float(n_t)),
            "time": now() - t0}
        if is_counts:
            # argmax-of-counts reference point (medaka models.py:338)
            b_c, _b_t = baseline_fn(jbatch)
            base_correct += float(b_c)
            row["baseline_acc"] = float(b_c) / max(1.0, float(n_t))
        elif host_baseline is not None:
            b_c = float(np.sum(
                (host_baseline == batch["labels"]) * batch["mask"]))
            base_correct += b_c
            row["baseline_acc"] = b_c / max(1.0, float(n_t))
        total_loss += float(loss)
        total_correct += float(n_c)
        total_count += float(n_t)
        n_batches += 1
        if csv_logger is not None:
            csv_logger.append(row)
    acc = total_correct / max(1.0, total_count)
    mean_loss = total_loss / max(1, n_batches)
    if has_baseline:
        base_acc = base_correct / max(1.0, total_count)
        logger.info(
            "[%s] epoch %d: loss %.4f acc %.4f (Q%.1f; baseline %.4f "
            "Q%.1f) in %.1fs", split, epoch, mean_loss, acc,
            qscore(acc), base_acc, qscore(base_acc), now() - t0)
    else:
        logger.info(
            "[%s] epoch %d: loss %.4f acc %.4f (Q%.1f) in %.1fs",
            split, epoch, mean_loss, acc, qscore(acc), now() - t0)
    return params, opt_state, mean_loss, acc


def _save_resume_state(train_name, epoch, params, opt_state, best,
                       best_epoch):
    """Write a lossless mid-training snapshot (optimizer state included).

    Reference medaka dumps optimizer state every 5 epochs
    (``training.py:189-191``) but cannot resume from it; here
    ``train --resume`` continues exactly where a killed run stopped.
    """
    import json

    p_leaves = jax.tree_util.tree_leaves(params)
    o_leaves = jax.tree_util.tree_leaves(opt_state)
    arrays = {
        "p{}".format(i): np.asarray(x) for i, x in enumerate(p_leaves)}
    arrays.update(
        {"o{}".format(i): np.asarray(x) for i, x in enumerate(o_leaves)})
    tmp = os.path.join(train_name, ".resume.npz.tmp")
    final = os.path.join(train_name, "resume.npz")
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, final)
    meta = {
        "epoch": epoch, "best_val_loss": float(best["val_loss"]),
        "best_val_acc": float(best["val_acc"]), "best_epoch": best_epoch,
        "n_param_leaves": len(p_leaves), "n_opt_leaves": len(o_leaves)}
    tmp = os.path.join(train_name, ".resume.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(train_name, "resume.json"))


def _load_resume_state(train_name, params_template, opt_state_template):
    """Load the snapshot written by :func:`_save_resume_state`.

    :returns: (next_epoch, params, opt_state, best dict, best_epoch)
        or None when no snapshot exists.
    """
    import json

    meta_path = os.path.join(train_name, "resume.json")
    npz_path = os.path.join(train_name, "resume.npz")
    if not (os.path.exists(meta_path) and os.path.exists(npz_path)):
        return None
    with open(meta_path) as fh:
        meta = json.load(fh)
    data = np.load(npz_path)

    def rebuild(template, prefix, count):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves) != count:
            raise ValueError(
                "Resume state has {} {} leaves but the current model/"
                "optimizer expects {}; cannot resume.".format(
                    count, prefix, len(leaves)))
        loaded = [
            jnp.asarray(
                data["{}{}".format(prefix, i)], dtype=leaves[i].dtype)
            for i in range(count)]
        return jax.tree_util.tree_unflatten(treedef, loaded)

    params = rebuild(params_template, "p", meta["n_param_leaves"])
    opt_state = rebuild(opt_state_template, "o", meta["n_opt_leaves"])
    best = {"val_loss": meta["best_val_loss"],
            "val_acc": meta["best_val_acc"]}
    return meta["epoch"] + 1, params, opt_state, best, meta["best_epoch"]


def run_training(
        train_name: str, batcher: TrainBatcher,
        model_dict: Optional[Dict] = None, epochs: int = 10,
        optimizer: str = "nadam", optim_args: Optional[Dict] = None,
        mesh=None, model_parallel: int = 1,
        compute_dtype=jnp.bfloat16, seed: int = 0,
        early_stop_epochs: int = 20, initial_params=None,
        resume: bool = False, samples_per_epoch: Optional[int] = None,
        use_lr_schedule: bool = True, class_weights=None):
    """Train a consensus model (reference ``training.py:60-236``).

    :param train_name: output directory.
    :param batcher: a :class:`TrainBatcher`.
    :param model_dict: {type, kwargs} architecture (default: bundled
        GRUModel geometry, scaled to the batcher's feature width).
    :param initial_params: warm-start params (e.g. from a checkpoint
        tarball); random init when None.
    :param samples_per_epoch: truncate each training epoch at this many
        samples (reference ``--samples_per_training_epoch``).
    :param use_lr_schedule: warmup+cosine when True (reference
        default), constant learning rate otherwise.
    :returns: (model, params) of the final epoch.
    """
    logger = common.get_named_logger("Training")
    os.makedirs(train_name, exist_ok=True)

    feature_encoder = batcher.meta.get("feature_encoder")
    label_scheme = batcher.meta.get("label_scheme")
    if model_dict is None:
        if batcher.is_read_level:
            # read-level default: the reference's rl_lstm384 geometry
            # (``options.py:175-182``, ``latent_space_lstm.py:47-59``),
            # dwell channel following the encoder
            use_dwells = bool(getattr(
                feature_encoder, "include_dwells", batcher.feat_dim >= 5))
            model_dict = {
                "type": "LatentSpaceLSTM",
                "kwargs": {"lstm_size": 384, "use_dwells": use_dwells}}
        else:
            model_dict = dict(models_mod.DEFAULT_MODEL_DICT)
            model_dict["kwargs"] = dict(model_dict["kwargs"])
            model_dict["kwargs"]["num_features"] = batcher.feat_dim
    model = models_mod.model_from_dict(model_dict)
    if batcher.is_read_level != (
            getattr(model, "input_kind", "counts") == "reads"):
        raise ValueError(
            "Model {} expects {} features but the feature files hold {} "
            "ones.".format(
                type(model).__name__,
                getattr(model, "input_kind", "counts"),
                "read-level" if batcher.is_read_level else "counts"))

    if mesh is None:
        import math

        n_avail = len(jax.devices()) // model_parallel
        data = math.gcd(batcher.batch_size, n_avail)
        mesh = parallel.make_mesh(
            jax.devices()[:data * model_parallel], data=data,
            model=model_parallel)
    if initial_params is not None:
        params = jax.tree_util.tree_map(jnp.asarray, initial_params)
        logger.info("Warm-starting from provided checkpoint params.")
    else:
        params = model.init_params(jax.random.PRNGKey(seed))
    params = parallel.shard_params(params, mesh)

    max_batches = None
    steps_per_epoch = batcher.n_batches("train")
    if samples_per_epoch is not None:
        max_batches = max(1, samples_per_epoch // batcher.batch_size)
        steps_per_epoch = min(steps_per_epoch, max_batches)
    peak_lr = (
        _OPTIMIZERS[optimizer][1]["learning_rate"]
        if not (optim_args or {}).get("learning_rate")
        else optim_args["learning_rate"])
    schedule = cosine_schedule(
        peak_lr, total_steps=epochs * steps_per_epoch) \
        if use_lr_schedule else peak_lr
    opt = build_optimizer(optimizer, schedule, optim_args)
    opt_state = opt.init(params)

    step_fn = parallel.make_train_step(
        model, opt, mesh, compute_dtype=compute_dtype,
        class_weights=class_weights)

    eval_fn = jax.jit(
        lambda p, b: parallel.cross_entropy_loss(
            model, p, b, compute_dtype=compute_dtype, training=False))

    csv_logger = CSVLogger(os.path.join(train_name, "training.csv"))
    best = {"val_loss": np.inf, "val_acc": -np.inf}
    best_epoch = 0
    first_epoch = 0
    if resume:
        state = _load_resume_state(train_name, params, opt_state)
        if state is None:
            logger.info("No resume state in %s; training from scratch.",
                        train_name)
        else:
            first_epoch, params, opt_state, best, best_epoch = state
            params = parallel.shard_params(params, mesh)
            logger.info("Resuming from epoch %d.", first_epoch)

    def save(name, p):
        return models_mod.save_model(
            os.path.join(train_name, name + ".tar.gz"), model,
            jax.tree_util.tree_map(np.asarray, p),
            feature_encoder=feature_encoder, label_scheme=label_scheme)

    for epoch in range(first_epoch, epochs):
        params, opt_state, _loss, _acc = run_epoch(
            step_fn, params, opt_state, batcher, "train", epoch,
            logger, csv_logger, is_training=True,
            max_batches=max_batches)
        save("model-{}".format(epoch), params)
        if batcher.valid_samples:
            _, _, val_loss, val_acc = run_epoch(
                step_fn, params, opt_state, batcher, "validation",
                epoch, logger, csv_logger, is_training=False,
                eval_fn=eval_fn)
            if val_loss < best["val_loss"]:
                best["val_loss"] = val_loss
                best_epoch = epoch
                save("model-best_val_loss", params)
            if val_acc > best["val_acc"]:
                best["val_acc"] = val_acc
                save("model-best_val_acc", params)
            if epoch - best_epoch >= early_stop_epochs:
                logger.info(
                    "Early stop: no val-loss improvement in %d epochs.",
                    early_stop_epochs)
                _save_resume_state(
                    train_name, epoch, params, opt_state, best, best_epoch)
                break
        _save_resume_state(
            train_name, epoch, params, opt_state, best, best_epoch)
    csv_logger.close()
    return model, jax.tree_util.tree_map(np.asarray, params)


def run_validation(batcher: TrainBatcher, model_path: str,
                   compute_dtype=jnp.bfloat16):
    """Evaluate a checkpoint on the batcher's validation split.

    Reference: ``medaka train --validate_only``
    (``medaka/training.py:38-46``). Returns (loss, accuracy).
    """
    logger = common.get_named_logger("Training")
    bundle = models_mod.open_model(models_mod.resolve_model(model_path))
    model, params = bundle.model, bundle.params
    if not batcher.valid_samples:
        logger.info(
            "No validation split; evaluating on all provided samples.")
        batcher.valid_samples = batcher.train_samples
    eval_fn = jax.jit(
        lambda p, b: parallel.cross_entropy_loss(
            model, p, b, compute_dtype=compute_dtype, training=False))
    _, _, loss, acc = run_epoch(
        None, params, None, batcher, "validation", 0, logger,
        is_training=False, eval_fn=eval_fn)
    return loss, acc


def train(args):
    """CLI entry point for `medaka_tpu train`."""
    batcher = TrainBatcher(
        args.features, validation=args.validation_features
        or args.validation_split, seed=args.seed,
        batch_size=args.batch_size, max_samples=args.max_samples,
        max_valid_samples=args.max_valid_samples)
    if getattr(args, "validate_only", False):
        if not args.model:
            raise ValueError("--validate_only requires --model.")
        run_validation(batcher, args.model)
        return
    model_dict = None
    initial_params = None
    if getattr(args, "model", None):
        if args.model.endswith(".toml"):
            # architecture-only config, random init (reference
            # ``training.py:77-86`` accepts the same)
            import tomllib
            with open(args.model, "rb") as fh:
                doc = tomllib.load(fh)
            model_dict = doc.get("model", doc)
        else:
            bundle = models_mod.open_model(
                models_mod.resolve_model(args.model))
            model_dict = bundle.model.to_dict()
            initial_params = bundle.params
    # bf16 mixed precision is the default (the reference's --amp
    # equivalent); --full_precision / --no-amp force float32
    amp = getattr(args, "amp", None)
    full_precision = getattr(args, "full_precision", False)
    if amp is True and full_precision:
        raise ValueError(
            "--amp and --full_precision are mutually exclusive.")
    compute_dtype = (
        jnp.float32 if (full_precision or amp is False)
        else jnp.bfloat16)
    run_training(
        args.train_name, batcher, model_dict=model_dict,
        epochs=args.epochs, optimizer=args.optimizer,
        optim_args=args.optim_args, seed=args.seed,
        model_parallel=getattr(args, "model_parallel", 1),
        initial_params=initial_params,
        resume=getattr(args, "resume", False),
        samples_per_epoch=getattr(
            args, "samples_per_training_epoch", None),
        use_lr_schedule=getattr(args, "use_lr_schedule", True),
        compute_dtype=compute_dtype)
