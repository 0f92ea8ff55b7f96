"""TPU kernel benchmarks: bf16 vs int8-recurrent fullfused bi-GRU.

Usage: python tpu_bench.py [--qv trained_model.tar.gz bam]

Timing honesty on the tunnelled platform: block_until_ready() returns
before execution completes, so every timed call fetches a scalar
checksum to host.
"""
import sys
import time

import numpy as np

BATCH = 512
CHUNK = 10000
FEATS = 10
HIDDEN = 256


def bench_forward(recurrent_quant=None, batch=BATCH, chunk=CHUNK):
    import jax
    import jax.numpy as jnp

    from medaka_tpu.models.gru import GRUModel

    model = GRUModel(num_features=FEATS, num_classes=5, gru_size=HIDDEN)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, chunk, FEATS), dtype=np.float32))
    lengths = jnp.full((batch,), chunk, dtype=jnp.int32)
    fwd = jax.jit(lambda p, x, l: model.apply(
        p, x, normalise=True, compute_dtype=jnp.bfloat16,
        lengths=l, recurrent_quant=recurrent_quant).sum())
    t0 = time.perf_counter()
    float(fwd(params, x, lengths))
    compile_s = time.perf_counter() - t0
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        float(fwd(params, x, lengths))
    dt = (time.perf_counter() - t0) / n_iter
    cols = batch * chunk / dt
    # 2 layers x 2 directions of per-step recurrence over T steps
    per_step_us = dt / chunk * 1e6
    print("quant={} B={} T={}: {:.1f} Mcols/s  {:.2f} us/step "
          "(walltime {:.3f}s, compile {:.0f}s)".format(
              recurrent_quant, batch, chunk, cols / 1e6, per_step_us,
              dt, compile_s), flush=True)
    return cols


def bench_qv(model_path, bam):
    """Consensus QV parity: int8 vs bf16 recurrence on real features."""
    import jax.numpy as jnp

    from medaka_tpu import models
    from medaka_tpu.common import Region
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.labels import HaploidLabelScheme

    bundle = models.load_model(model_path)
    enc = bundle.feature_encoder or CountsFeatureEncoder()
    scheme = bundle.label_scheme or HaploidLabelScheme()
    samples = enc.bam_to_sample(bam, Region("lambda_5kb", 0, 4970))
    outs = {}
    for quant in (None, "int8", "bf16_gates"):
        seqs, quals = [], []
        for s in samples:
            probs = np.asarray(bundle.model.apply(
                bundle.params, s.features[None], normalise=True,
                compute_dtype=jnp.bfloat16, fused=True,
                recurrent_quant=quant)[0], np.float32)
            seq, qual = scheme.decode_consensus(
                s.amend(label_probs=probs), with_qualities=True)
            seqs.append(seq)
            quals.append(np.frombuffer(
                qual.encode(), np.uint8).astype(np.int32) - 33)
        outs[quant] = ("".join(seqs), np.concatenate(quals))
    bf_seq, bf_q = outs[None]
    for quant in ("int8", "bf16_gates"):
        q_seq, q_q = outs[quant]
        same = bf_seq == q_seq
        print(quant, "consensus identical:", same, flush=True)
        if same:
            dq = np.abs(bf_q - q_q)
            print("  mean QV {:.2f} -> {:.2f}; mean|dQ| {:.3f} "
                  "max|dQ| {}".format(
                      bf_q.mean(), q_q.mean(), dq.mean(), dq.max()),
                  flush=True)
        else:
            from medaka_tpu import native
            print("  edit distance vs bf16:",
                  native.edit_distance(bf_seq, q_seq), flush=True)


def main():
    for quant in (None, "int8", "bf16_gates"):
        bench_forward(quant)
    if "--qv" in sys.argv:
        i = sys.argv.index("--qv")
        bench_qv(sys.argv[i + 1], sys.argv[i + 2])


if __name__ == "__main__":
    main()
