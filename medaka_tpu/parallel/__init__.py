"""Device-mesh parallelism for medaka_tpu.

The reference is single-node (SURVEY §2.3): its only scale-out is "run
independent jobs per contig and merge HDF5s". Here parallelism is
first-class: a `jax.sharding.Mesh` with axes

- ``data``  — batch dimension (genome chunks). The dominant axis: chunks
  are independent, so DP scales embarrassingly and collectives only carry
  metrics.
- ``model`` — tensor parallelism over the recurrent gate dimension
  (Megatron-style sharding of the (3H, in)/(3H, H) GRU weights and the
  (4H, ·) LSTM weights). XLA/GSPMD inserts the all-gathers over ICI.

Parameters are annotated with `PartitionSpec`s; everything else is left
to sharding propagation. ``shard_map`` is intentionally avoided for the
compute path — GSPMD handles the einsum/scan layouts well and keeps the
code a single pure function.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medaka_tpu import common

logger = common.get_named_logger("parallel")

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    :param devices: explicit device list (default ``jax.devices()``).
    :param data: data-axis size (default: n_devices // model).
    :param model: model (tensor-parallel) axis size.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(
                "{} devices not divisible by model={}".format(n, model))
        data = n // model
    if data * model != n:
        raise ValueError(
            "mesh {}x{} != {} devices".format(data, model, n))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def params_spec_for_model(model, params) -> Dict:
    """PartitionSpec pytree matching a model's parameter pytree.

    Recurrent weight matrices are sharded over ``model``; small heads and
    anything unrecognised is replicated.
    """
    def spec_for(path: Tuple[str, ...], leaf) -> P:
        names = set(path)
        if {"w_ih", "w_hh"} & names:
            return P(MODEL_AXIS, None)
        if {"b_ih", "b_hh"} & names and leaf.ndim == 1:
            return P(MODEL_AXIS)
        return P()

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [walk(v, path) for v in node]
            return type(node)(out) if isinstance(node, tuple) else out
        return spec_for(path, node)

    return walk(params, ())


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to :func:`params_spec_for_model`."""
    specs = params_spec_for_model(None, params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(
            leaf, NamedSharding(mesh, spec)),
        params, specs)


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding on a mesh."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _tp_kernel_fence(model, mesh: Mesh) -> Dict:
    """Extra ``apply`` kwargs fencing Pallas kernels off under TP.

    The fused Pallas recurrences are validated unsharded (and on
    data-only meshes, where each shard sees a full copy of the weights);
    with the gate dimension sharded over ``model`` their BlockSpecs would
    see partial weights. Until TP-through-Pallas is validated on real
    multi-chip hardware, force the GSPMD scan path — XLA partitions it
    correctly (tests/test_parallel.py parity at 8x1/4x2/2x4).
    """
    import inspect
    model_par = dict(
        zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    if model_par <= 1:
        return {}
    if "fused" not in inspect.signature(model.apply).parameters:
        return {}
    logger.warning(
        "model axis size %d > 1: recurrent compute uses the GSPMD scan "
        "path (fused Pallas kernels are validated unsharded only).",
        model_par)
    return {"fused": False}


def make_sharded_forward(model, mesh: Mesh, compute_dtype=jnp.bfloat16,
                         apply_kwargs: Optional[Dict] = None):
    """Jit a forward pass with DP batch + TP param shardings.

    Pure-DP meshes (model axis absent or 1) run the per-shard forward
    under ``shard_map``: batch rows are independent, so each device
    executes the model — including the fused Pallas kernels — on its
    local batch slice with a full weight copy. This is the canonical
    pallas-under-SPMD pattern; plain GSPMD would have to partition the
    kernel's custom call itself. Meshes with a model axis >1 keep the
    GSPMD path with the scan fence (:func:`_tp_kernel_fence`).

    :param apply_kwargs: extra kwargs for ``model.apply`` (e.g.
        ``{"fused": True, "interpret": True}`` to validate the fused
        kernel path on a virtual CPU mesh). The TP fence wins on
        conflicts.
    """
    fence = dict(apply_kwargs or {})
    fence.update(_tp_kernel_fence(model, mesh))
    model_par = dict(
        zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    n_dev = mesh.devices.size

    def forward(params, x, lengths):
        return model.apply(
            params, x, normalise=True, compute_dtype=compute_dtype,
            lengths=lengths, **fence)

    if model_par == 1 and n_dev > 1:
        shard_map = jax.shard_map
        data_axes = tuple(
            ax for ax in mesh.axis_names if ax != MODEL_AXIS) or \
            (DATA_AXIS,)
        pspec_b = P(data_axes)
        sharded = shard_map(
            forward, mesh=mesh,
            in_specs=(P(), pspec_b, pspec_b), out_specs=pspec_b,
            check_vma=False)
        return jax.jit(sharded)

    return jax.jit(
        forward,
        in_shardings=(
            None,  # params carry their shardings from device_put
            batch_sharding(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh))


def cross_entropy_loss(model, params, batch, compute_dtype=None,
                       training=True, apply_kwargs=None,
                       class_weights=None):
    """Masked cross-entropy over a (features, labels, mask) batch dict.

    ``labels`` are int class ids; ``mask`` (B, T) excludes padding.
    Returns (loss, (n_correct, n_total)) for accuracy accounting mirroring
    the reference metrics (``medaka/models.py:315-345``).
    ``training=False`` for evaluation (batch-norm running statistics,
    no need for differentiable kernel paths).

    :param class_weights: optional (num_classes,) per-target-class loss
        weights, normalised like torch's weighted CrossEntropyLoss
        (sum of weights at the targets in the denominator). The
        reference trains unweighted; this is an opt-in lever for
        class-imbalanced schemes (e.g. rare heterozygous diploid
        classes).
    """
    logits = model.apply(
        params, batch["features"], normalise=False,
        compute_dtype=compute_dtype,
        lengths=batch.get("lengths"), training=training,
        **(apply_kwargs or {}))
    labels = batch["labels"]
    mask = batch["mask"].astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(
        logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, logp.dtype)[
            labels.astype(jnp.int32)] * mask
        loss = -(ll * w).sum() / jnp.maximum(w.sum(), 1e-6)
    else:
        loss = -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    pred = jnp.argmax(logits, axis=-1)
    n_correct = ((pred == labels) * batch["mask"]).sum()
    n_total = batch["mask"].sum()
    return loss, (n_correct, n_total)


def majority_baseline_accuracy(batch):
    """Argmax-of-counts baseline accuracy for counts batches.

    The reference reports model accuracy alongside this baseline per batch
    (``medaka/models.py:338-343``). Only meaningful for 10-channel
    counts features; returns (n_correct, n_total).
    """
    x = batch["features"]
    if x.ndim != 3 or x.shape[-1] != 10:
        return jnp.zeros(()), jnp.zeros(())
    from medaka_tpu.models.majority import MajorityVoteModel
    probs = MajorityVoteModel().apply({}, x)
    pred = jnp.argmax(probs, axis=-1)
    n_correct = ((pred == batch["labels"]) * batch["mask"]).sum()
    return n_correct, batch["mask"].sum()


def make_train_step(model, optimizer, mesh: Mesh,
                    compute_dtype=jnp.bfloat16, class_weights=None):
    """Build a jitted, mesh-sharded SGD step.

    Batch is sharded over ``data``; params/opt-state are laid out by
    their own shardings (TP over ``model`` via :func:`shard_params`).
    Loss/metric outputs are replicated scalars (GSPMD inserts the psum).
    ``class_weights`` — see :func:`cross_entropy_loss`.
    """
    bspec = batch_sharding(mesh)
    fence = _tp_kernel_fence(model, mesh)
    # models with batch-normalisation (LatentSpaceLSTM) expose their
    # per-batch statistics so the step can maintain running mean/var —
    # the analogue of torch BatchNorm1d's momentum update; without it
    # eval-mode normalisation would forever use the init (0, 1) stats
    collect_bn = getattr(model, "has_batch_stats", False)
    bn_momentum = 0.1

    @functools.partial(
        jax.jit,
        in_shardings=(None, None,
                      {"features": bspec, "labels": bspec, "mask": bspec,
                       "lengths": bspec}),
        out_shardings=(None, None, replicated(mesh), replicated(mesh),
                       replicated(mesh)),
        donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            stats: list = []
            kwargs = dict(fence)
            if collect_bn:
                kwargs["bn_stats"] = stats
            loss, (n_correct, n_total) = cross_entropy_loss(
                model, p, batch, compute_dtype=compute_dtype,
                apply_kwargs=kwargs, class_weights=class_weights)
            return loss, (n_correct, n_total, stats)

        (loss, (n_correct, n_total, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        for i, (mean, var) in enumerate(stats):
            bn = params["convs"][i]["bn"]
            bn["mean"] = ((1 - bn_momentum) * bn["mean"]
                          + bn_momentum * mean.astype(bn["mean"].dtype))
            bn["var"] = ((1 - bn_momentum) * bn["var"]
                         + bn_momentum * var.astype(bn["var"].dtype))
        return params, opt_state, loss, n_correct, n_total

    return train_step


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (`jax.distributed.initialize` wrapper).

    On single-host (or under the test CPU mesh) this is a no-op; on a pod
    slice each host calls it before building the global mesh.
    """
    if num_processes is None or num_processes <= 1:
        logger.debug("Single-process run; skipping jax.distributed init.")
        return
    if coordinator is None:
        # coordinator-less scale-out: each process is an independent
        # job taking a deterministic region share (shard_regions) and
        # writing its own output — the reference's per-contig scale-out
        # pattern. No cross-process collectives, so no jax.distributed.
        logger.info(
            "Process %d/%d running coordinator-less (region striding "
            "only; outputs merge via DataIndex).",
            process_id, num_processes)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes, process_id=process_id)
    logger.info(
        "Initialized process %d/%d (global devices: %d).",
        process_id, num_processes, len(jax.devices()))


def shard_regions(regions, num_hosts: int, host_id: int):
    """Deterministic region -> host assignment for multi-host runs.

    Replaces the reference's "run independent jobs per contig and merge
    HDF5s" advice (``README.md:294-330``): every host computes the same
    global ordering and takes a strided slice, so the union over hosts
    is exactly the input and any host count yields the same outputs.
    """
    ordered = sorted(regions, key=lambda r: (r.ref_name, r.start or 0))
    return ordered[host_id::num_hosts]
