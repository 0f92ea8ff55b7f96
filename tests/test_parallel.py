"""Tests for mesh sharding: DP+TP forward parity and train step.

Runs on the virtual 8-device CPU mesh configured in conftest.py. These
are the multi-chip tests the reference lacks entirely (SURVEY §4): the
sharded forward must match the single-device forward bitwise-ish, and
outputs must be independent of mesh topology.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medaka_tpu import parallel
from medaka_tpu.models.gru import GRUModel


@pytest.fixture()
def setup():
    # function-scoped: the train step donates params buffers
    # (donate_argnums), so a shared pytree would be deleted across tests
    model = GRUModel(num_features=10, num_classes=5, gru_size=32)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.random((8, 64, 10)).astype(np.float32)
    lengths = np.array([64, 64, 50, 64, 3, 64, 64, 17], np.int32)
    return model, params, x, lengths


@pytest.mark.parametrize("data,model_par", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_sharded_forward_matches_single(setup, data, model_par):
    model, params, x, lengths = setup
    ref = np.asarray(model.apply(params, x, lengths=lengths))
    mesh = parallel.make_mesh(
        jax.devices()[:data * model_par], data=data, model=model_par)
    sharded_params = parallel.shard_params(params, mesh)
    fwd = parallel.make_sharded_forward(model, mesh, compute_dtype=None)
    got = np.asarray(fwd(sharded_params, jnp.asarray(x),
                         jnp.asarray(lengths)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_train_step_decreases_loss(setup):
    model, params, x, lengths = setup
    mesh = parallel.make_mesh(jax.devices(), data=4, model=2)
    params = parallel.shard_params(params, mesh)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(1)
    batch = {
        "features": jnp.asarray(x),
        "labels": jnp.asarray(rng.integers(0, 5, (8, 64)), dtype=jnp.int32),
        "mask": jnp.asarray(
            (np.arange(64)[None, :] < lengths[:, None]).astype(np.float32)),
        "lengths": jnp.asarray(lengths),
    }
    step = parallel.make_train_step(
        model, optimizer, mesh, compute_dtype=None)
    losses = []
    for _ in range(5):
        params, opt_state, loss, n_c, n_t = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert 0 <= float(n_c) <= float(n_t)


def test_topology_independent_training(setup):
    """Same batch, different mesh shapes -> same updated params."""
    model, params, x, lengths = setup
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 5, (8, 64)).astype(np.int32)
    batch = {
        "features": jnp.asarray(x),
        "labels": jnp.asarray(labels),
        "mask": jnp.ones((8, 64), jnp.float32),
        "lengths": jnp.asarray(np.full(8, 64, np.int32)),
    }
    results = []
    for data, model_par in [(1, 1), (8, 1), (4, 2)]:
        mesh = parallel.make_mesh(
            jax.devices()[:data * model_par], data=data, model=model_par)
        p = parallel.shard_params(
            jax.tree_util.tree_map(np.asarray, params), mesh)
        optimizer = optax.sgd(1e-2)
        opt_state = optimizer.init(p)
        step = parallel.make_train_step(
            model, optimizer, mesh, compute_dtype=None)
        p, *_ = step(p, opt_state, batch)
        results.append(
            np.asarray(p["gru"][0]["fwd"]["w_ih"]))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0], results[2], rtol=1e-5, atol=1e-6)


def test_tp_fence_forces_scan_path(setup):
    """model axis > 1 must fence the Pallas kernels off (VERDICT r2 #3):
    the fused kernels are validated unsharded, so under TP the apply
    must be forced onto the GSPMD-partitionable scan path."""
    model, params, x, lengths = setup
    mesh_tp = parallel.make_mesh(jax.devices(), data=4, model=2)
    assert parallel._tp_kernel_fence(model, mesh_tp) == {"fused": False}
    mesh_dp = parallel.make_mesh(jax.devices(), data=8, model=1)
    assert parallel._tp_kernel_fence(model, mesh_dp) == {}


def test_sharded_forward_bf16_tp_matches(setup):
    """bf16 compute + TP runs the fence threading end-to-end.

    On this CPU mesh the auto-select would already pick scan, so this
    checks the explicit fused=False kwarg reaches apply() without
    breaking jit/sharding, and output still matches full precision."""
    model, params, x, lengths = setup
    ref = np.asarray(model.apply(params, x, lengths=lengths))
    mesh = parallel.make_mesh(jax.devices(), data=4, model=2)
    sharded = parallel.shard_params(params, mesh)
    fwd = parallel.make_sharded_forward(
        model, mesh, compute_dtype=jnp.bfloat16)
    got = np.asarray(fwd(sharded, jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_fused_kernels_inside_shard_map_match_unsharded(setup):
    """The multi-device DP path runs the model under shard_map so each
    device executes the Pallas kernels on its local batch shard (plain
    GSPMD cannot partition the kernels' custom calls). Prove the
    pattern end-to-end on the virtual mesh with interpret-mode kernels:
    the sharded result must equal the unsharded kernel result."""
    from jax.sharding import PartitionSpec as P

    from medaka_tpu.ops.pallas_gru import bigru_head_fullfused
    shard_map = jax.shard_map

    model, params, x, lengths = setup
    want = np.asarray(bigru_head_fullfused(
        params["gru"], params["linear"], x,
        lengths=jnp.asarray(lengths), quant=True, interpret=True))

    mesh = parallel.make_mesh(jax.devices(), data=8, model=1)

    def fwd(p, xs, ls):
        return bigru_head_fullfused(
            p["gru"], p["linear"], xs, lengths=ls, quant=True,
            interpret=True)

    sharded = jax.jit(shard_map(
        fwd, mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    got = np.asarray(sharded(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_coordinatorless_multi_process_init():
    """--num_processes without --coordinator must not touch
    jax.distributed (region striding needs no collectives); calling it
    after backend init would raise otherwise."""
    import jax

    from medaka_tpu import parallel

    jax.devices()  # ensure the backend is initialised
    parallel.initialize_distributed(None, 2, 1)  # must be a no-op


def test_class_weighted_loss(setup):
    """class_weights follow torch's weighted-CE semantics: weights at
    the target labels scale both numerator and denominator; uniform
    weights reproduce the unweighted loss exactly."""
    import jax.numpy as jnp

    model, params, x, lengths = setup
    rng = np.random.default_rng(3)
    batch = {
        "features": jnp.asarray(x),
        "labels": jnp.asarray(rng.integers(0, 5, (8, 64)), dtype=jnp.int32),
        "mask": jnp.asarray(
            (np.arange(64)[None, :] < lengths[:, None]).astype(np.float32)),
        "lengths": jnp.asarray(lengths),
    }
    base, _ = parallel.cross_entropy_loss(model, params, batch)
    uniform, _ = parallel.cross_entropy_loss(
        model, params, batch, class_weights=np.full(5, 3.0, np.float32))
    np.testing.assert_allclose(float(uniform), float(base), rtol=1e-6)
    # upweighting one class moves the loss toward that class's mean nll
    w = np.ones(5, np.float32)
    w[2] = 100.0
    heavy, _ = parallel.cross_entropy_loss(
        model, params, batch, class_weights=w)
    only2 = {**batch, "mask": batch["mask"] * (batch["labels"] == 2)}
    target, _ = parallel.cross_entropy_loss(model, params, only2)
    assert abs(float(heavy) - float(target)) < abs(float(base) - float(target))
