"""Training campaign: beat majority-vote by >= 2Q.

Builds a labelled training set entirely with this framework's own
tools from the real workflow reads (the reference ships 450x real ONT
reads of a 5 kb lambda region plus the high-quality reference):

1. synthetic-mutation drafts of the reference (subs/ins/del at
   0.2-1%) — the "imperfect assembly" the consensus model corrects;
2. per-draft independent downsamples of the real reads (20-60x, the
   realistic polishing regime — at the full 450x majority-vote is
   near-perfect and the NN has nothing to add);
3. own mapper (``mapping.align_reads``) for reads->draft and
   truth->draft BAMs, own featurizer + ``TruthAlignment`` labels via
   ``features.create_samples``.

Training runs the mesh train step (bf16 trainable Pallas kernels on
the TPU when available). Held-out drafts (every 5th) form the
validation split; the campaign reports model Q vs the majority-vote
baseline Q on that split.

``--read-level`` switches the whole pipeline to the read-level family
the reference trains in-tree (``ReadAlignmentFeatureEncoder`` 3-D
int8 features -> LatentSpaceLSTM; reference ``torch_ext.py:111-166``,
``training.py:440-458``): shorter chunks (richer per-sample tensors),
no dwell channel (the workflow reads carry no ``mv`` tags), and the
majority baseline computed host-side from each sample's counts
derivation.

Usage: python tests/perf/train_campaign.py [out_dir] [n_drafts] [epochs]
           [--read-level] [--lstm-size N]
"""
import gzip
import json
import os
import pathlib
import sys

import numpy as np

WORKFLOW = "/root/reference/medaka/test/data/workflow"
BASES = np.array(list("ACGT"))


def mutate(seq, rng, rate):
    """Apply subs (60%) / del (20%) / ins (20%) at ``rate`` per base."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate * 0.2:
            continue
        if r < rate * 0.4:
            out.append(ch)
            out.append(str(rng.choice(BASES)))
            continue
        if r < rate:
            out.append(str(rng.choice([b for b in "ACGT" if b != ch])))
            continue
        out.append(ch)
    return "".join(out)


def subsample_reads(out_path, keep_frac, rng):
    """Random subset of the workflow fastq at ``keep_frac``."""
    n = 0
    with gzip.open(WORKFLOW + "/reads.fq.gz", "rt") as fin, \
            open(out_path, "w") as fout:
        while True:
            rec = [fin.readline() for _ in range(4)]
            if not rec[0]:
                break
            if rng.random() < keep_frac:
                fout.writelines(rec)
                n += 1
    return n


def make_gcrep_genome(rng, core_kb=14):
    """GC-skewed, repeat-dense synthetic truth genome.

    A second, independent training/eval condition (the reference's
    bundled models span many genome/chemistry conditions,
    ``options.py:29-103``; no second real read set ships in-tree, so
    this condition is fully synthetic with its own seed): 70% GC
    background, three dispersed ~2 kb repeat copies at ~2% mutual
    divergence, and a 200 bp x 15 tandem array — the hard cases for
    a mapper+consensus stack.
    """
    gc_bases = np.array(list("ACGT"))
    p = [0.15, 0.35, 0.35, 0.15]
    core = rng.choice(gc_bases, size=core_kb * 1000, p=p)
    unit = rng.choice(gc_bases, size=2000, p=p)
    copies = []
    for _ in range(3):
        cp = unit.copy()
        div = rng.random(len(cp)) < 0.02
        cp[div] = rng.choice(gc_bases, size=int(div.sum()))
        copies.append(cp)
    tandem_unit = rng.choice(gc_bases, size=200, p=p)
    tandem = np.tile(tandem_unit, 15)
    third = len(core) // 3
    parts = [core[:third], copies[0], core[third:2 * third], copies[1],
             tandem, core[2 * third:], copies[2]]
    return "".join("".join(x) for x in parts)


_RC = str.maketrans("ACGT", "TGCA")


def simulate_reads_fq(truth_seq, depth, rng, out_fq, read_len=3000):
    """Systematic-error long reads from the truth, written as fastq.

    Half the reads are reverse-complemented before writing: real
    sequencing covers both strands, and the counts encoder keeps
    per-strand channels — training on forward-only reads leaves the
    reverse-strand channels identically zero, producing a model that
    misreads any both-strand pileup (measured: Q4 vs Q29 majority on
    the lambda condition before this fix).
    """
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from mock_data import simulate_hpbias_read
    ref_arr = np.frombuffer(truth_seq.encode(), np.uint8).copy()
    n_reads = max(1, int(len(truth_seq) * depth / read_len))
    n = 0
    with open(out_fq, "w") as fh:
        for i in range(n_reads):
            length = min(read_len, len(truth_seq) - 1)
            start = int(rng.integers(0, len(truth_seq) - length))
            seq = simulate_hpbias_read(ref_arr, start, length, rng)
            if rng.random() < 0.5:
                seq = seq.translate(_RC)[::-1]
            fh.write("@sr{}\n{}\n+\n{}\n".format(i, seq, "5" * len(seq)))
            n += 1
    return n


def build_draft_set(out_dir, n_drafts, threads=4, read_level=False,
                    condition="lambda"):
    """Per-draft labelled feature files; returns (train, valid) lists."""
    from medaka_tpu import mapping
    from medaka_tpu.features import create_samples
    from medaka_tpu.io.fastx import FastaReader, FastaWriter

    if condition == "gcrep":
        ref_seq = make_gcrep_genome(np.random.default_rng(77))
        contig = "gcrep"
    else:
        ref_seq = FastaReader(WORKFLOW + "/reference.fasta").fetch(
            "lambda_5kb")
        contig = "lambda_5kb"
    truth_fa = str(out_dir / "truth.fasta")
    with FastaWriter(truth_fa) as fw:
        fw.write("truth_" + contig, ref_seq)

    enc_kwargs = {}
    if read_level:
        # shorter chunks: a read-level sample is 40x larger per
        # column than counts; the workflow reads carry no mv tags
        enc_kwargs = {
            "feature_encoder_name": "ReadAlignmentFeatureEncoder",
            "feature_encoder_args": {
                "include_dwells": False, "max_reads": 100},
            "chunk_len": 500, "chunk_ovlp": 100}
    else:
        enc_kwargs = {"chunk_len": 1000, "chunk_ovlp": 200}

    rates = [0.002, 0.005, 0.01]
    depths = [20, 30, 45, 60]
    train, valid = [], []
    for k in range(n_drafts):
        rng = np.random.default_rng(1000 + k)
        rate = rates[k % len(rates)]
        depth = depths[(k // len(rates)) % len(depths)]
        ddir = out_dir / "draft{:02d}".format(k)
        ddir.mkdir(exist_ok=True)
        draft_fa = str(ddir / "draft.fasta")
        with FastaWriter(draft_fa) as fw:
            fw.write(contig, mutate(ref_seq, rng, rate))
        reads_fq = str(ddir / "reads.fq")
        if condition == "gcrep":
            simulate_reads_fq(ref_seq, depth, rng, reads_fq)
        else:
            subsample_reads(reads_fq, depth / 450.0, rng)
        reads_bam = str(ddir / "reads.bam")
        mapping.align_reads(
            reads_fq, draft_fa, reads_bam, threads=threads)
        truth_bam = str(ddir / "truth.bam")
        mapping.align_reads(truth_fa, draft_fa, truth_bam, md=True)
        feats = str(ddir / "feats.hdf5")
        n = create_samples(
            reads_bam, feats, truth_bam=truth_bam,
            threads=threads, **enc_kwargs)
        (valid if k % 5 == 4 else train).append(feats)
        print("draft {:02d}: rate={} depth={}x -> {} samples".format(
            k, rate, depth, n), flush=True)
    return train, valid


def q_from_acc(acc):
    return -10.0 * np.log10(max(1e-9, 1.0 - acc))


def evaluate(batcher, model, params, compute_dtype):
    """(model_acc, majority_acc) over the validation split."""
    import jax

    from medaka_tpu import parallel

    eval_fn = jax.jit(
        lambda p, b: parallel.cross_entropy_loss(
            model, p, b, compute_dtype=compute_dtype, training=False))
    n_c = n_t = mj_c = mj_t = 0.0
    for batch in batcher.batches("validation", shuffle=False):
        # read-level batches carry the exact host-side majority argmax
        baseline_pred = batch.pop("baseline_pred", None)
        _, (c, t) = eval_fn(params, batch)
        n_c += float(c)
        n_t += float(t)
        if baseline_pred is not None:
            mj_c += float(np.sum(
                (baseline_pred == batch["labels"]) * batch["mask"]))
            mj_t += float(batch["mask"].sum())
        else:
            c, t = parallel.majority_baseline_accuracy(batch)
            mj_c += float(c)
            mj_t += float(t)
    return n_c / max(1, n_t), mj_c / max(1, mj_t)


def cross_eval(dirs):
    """Q-vs-majority matrix: each dir's model on each dir's validation.

    Every quality claim must rest on more than one genome condition
    (VERDICT r3 item 4; the reference's bar is its multi-condition
    model catalogue, ``options.py:29-103``). Each spec is
    ``campaign_dir`` (model at ``train/model-best_val_loss.tar.gz``)
    or ``campaign_dir=model_path`` to pin a specific bundle (e.g. the
    committed round-3 lambda model) to that condition.
    """
    import jax
    import jax.numpy as jnp

    from medaka_tpu import models, training

    compute_dtype = (
        jnp.bfloat16 if jax.default_backend() != "cpu" else None)
    specs = []
    for spec in dirs:
        d, _, m = spec.partition("=")
        specs.append((d, m or str(
            pathlib.Path(d) / "train" / "model-best_val_loss.tar.gz")))
    matrix = {}
    for model_dir, model_path in specs:
        bundle = models.load_model(model_path)
        for data_dir, _ in specs:
            sets = json.loads(
                (pathlib.Path(data_dir) / "dataset.json").read_text())
            batcher = training.TrainBatcher(
                sets["valid"], validation=sets["valid"],
                batch_size=128, seed=0)
            acc, mj = evaluate(
                batcher, bundle.model, bundle.params, compute_dtype)
            key = "{}->{}".format(
                pathlib.Path(model_dir).name, pathlib.Path(data_dir).name)
            matrix[key] = {
                "model_q": round(q_from_acc(acc), 2),
                "majority_q": round(q_from_acc(mj), 2),
                "margin": round(q_from_acc(acc) - q_from_acc(mj), 2)}
            print(key, json.dumps(matrix[key]), flush=True)
    print("MATRIX " + json.dumps(matrix), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from medaka_tpu import training

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    read_level = "--read-level" in sys.argv
    lstm_size = 128
    condition = "lambda"
    for a in sys.argv[1:]:
        if a.startswith("--lstm-size"):
            lstm_size = int(a.split("=", 1)[1])
        if a.startswith("--condition"):
            condition = a.split("=", 1)[1]
        if a.startswith("--cross-eval"):
            cross_eval(a.split("=", 1)[1].split(","))
            return
    out_dir = pathlib.Path(
        args[0] if len(args) > 0 else "/tmp/train_campaign")
    n_drafts = int(args[1]) if len(args) > 1 else 40
    epochs = int(args[2]) if len(args) > 2 else 300
    out_dir.mkdir(parents=True, exist_ok=True)

    marker = out_dir / "dataset.json"
    if marker.exists():
        sets = json.loads(marker.read_text())
        train, valid = sets["train"], sets["valid"]
        print("Reusing dataset: {} train / {} valid files".format(
            len(train), len(valid)), flush=True)
    else:
        train, valid = build_draft_set(
            out_dir, n_drafts, read_level=read_level,
            condition=condition)
        marker.write_text(json.dumps({"train": train, "valid": valid}))

    # the reference's bundled labelled features (1.16 Mb of a real
    # assembly, same 1000-column geometry) add volume and a second
    # genome; validation stays purely on the held-out drafts.
    # (Counts-only: the bundled file holds 2-D features.)
    ref_feats = ("/root/reference/medaka/test/data/"
                 "training_features.hdf5")
    if (not read_level and condition == "lambda"
            and os.path.exists(ref_feats)
            and not os.environ.get("CAMPAIGN_NO_REF_FEATURES")):
        train = list(train) + [ref_feats]

    batch_size = 32 if read_level else 128
    batcher = training.TrainBatcher(
        train, validation=valid, batch_size=batch_size, seed=0)
    compute_dtype = (
        jnp.bfloat16 if jax.default_backend() != "cpu" else None)
    model_dict = None
    if read_level:
        model_dict = {
            "type": "LatentSpaceLSTM",
            "kwargs": {"lstm_size": lstm_size, "use_dwells": False}}
    model, params = training.run_training(
        str(out_dir / "train"), batcher, epochs=epochs,
        model_dict=model_dict,
        compute_dtype=compute_dtype, early_stop_epochs=60)

    acc, mj = evaluate(batcher, model, params, compute_dtype)
    print(json.dumps({
        "val_acc": acc, "val_q": round(q_from_acc(acc), 2),
        "majority_acc": mj, "majority_q": round(q_from_acc(mj), 2),
        "q_margin": round(q_from_acc(acc) - q_from_acc(mj), 2)}),
        flush=True)


if __name__ == "__main__":
    main()
