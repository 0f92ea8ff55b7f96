"""Fused-Pallas-under-mesh proof on real TPU hardware (VERDICT r2 #3).

The sharding parity suite runs the scan path on the virtual CPU mesh;
this script closes the remaining gap by running the *fused* kernels on
a real chip through both production mesh entry points:

1. ``Predictor`` on its default 1-device ("data",) mesh with bf16
   compute (fused kernels auto-selected) — checked against the f32
   scan path.
2. ``parallel.make_sharded_forward`` on an explicit 1x1 (data, model)
   mesh with bf16 compute — the same jit/sharding wrapper multi-chip
   DP uses; fused kernels must lower and match under it.
3. The TP fence: on a model>1 mesh ``_tp_kernel_fence`` must force the
   scan path (cannot execute here with one chip, asserted statically).

Run: python tests/perf/tpu_mesh_check.py
Prints PASS/FAIL per check; exits non-zero on failure.
"""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from medaka_tpu import parallel
    from medaka_tpu.models.gru import GRUModel
    from medaka_tpu.prediction import Batch, Predictor
    from medaka_tpu.common import Sample

    if jax.default_backend() in ("cpu",):
        print("SKIP: no TPU backend available")
        return 0

    model = GRUModel(num_features=10, num_classes=5, gru_size=256)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, T = 32, 1000
    x = rng.random((B, T, 10)).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    lengths[-3:] = [17, 500, 999]

    ref = np.asarray(model.apply(
        params, x, lengths=jnp.asarray(lengths), fused=False))
    ok = True

    # 1. Predictor on its 1-device data mesh, bf16 -> fused kernels
    samples = [
        Sample(ref_name="chr1", features=x[i, :lengths[i]], labels=None,
               ref_seq=None,
               positions=np.zeros(
                   int(lengths[i]),
                   dtype=[("major", int), ("minor", int)]),
               label_probs=None)
        for i in range(B)]
    batch = Batch(features=x, lengths=lengths, samples=samples)
    pred = Predictor(model, params, compute_dtype=jnp.bfloat16)
    got = pred.predict_on_batch(batch)
    mask = np.arange(T)[None, :] < lengths[:, None]
    diff = np.abs(got - ref)[mask].max()
    print("predictor 1-dev mesh fused bf16: max|dp|={:.4g} {}".format(
        diff, "PASS" if diff < 5e-3 else "FAIL"), flush=True)
    ok &= diff < 5e-3

    # 2. make_sharded_forward on an explicit 1x1 (data, model) mesh
    mesh = parallel.make_mesh(jax.devices()[:1], data=1, model=1)
    sharded = parallel.shard_params(params, mesh)
    fwd = parallel.make_sharded_forward(
        model, mesh, compute_dtype=jnp.bfloat16)
    got2 = np.asarray(fwd(sharded, jnp.asarray(x), jnp.asarray(lengths)))
    diff2 = np.abs(got2 - ref)[mask].max()
    print("make_sharded_forward 1x1 mesh fused bf16: max|dp|={:.4g} {}"
          .format(diff2, "PASS" if diff2 < 5e-3 else "FAIL"), flush=True)
    ok &= diff2 < 5e-3

    # 3. TP fence is active for model>1 meshes (static check)
    class _FakeMesh:
        axis_names = ("data", "model")
        devices = np.empty((1, 2))
    fence = parallel._tp_kernel_fence(model, _FakeMesh())
    print("tp fence model=2: {} {}".format(
        fence, "PASS" if fence == {"fused": False} else "FAIL"),
        flush=True)
    ok &= fence == {"fused": False}

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
