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


# ---------------------------------------------------------------------------
# RLE campaign (round 5): the reference's legacy run-length-encoded
# model family (``medaka/rle.py``, HardRLE encoders + RLELabelScheme,
# ``labels.py:1247-1324``) — the last untraversed model surface. Reads
# and truth are homopolymer-compressed against the draft
# (``rle.compress_bam``; run lengths ride in the qualities), features
# are qscore-stratified counts (10 x num_qstrat), labels are
# (base, run) classes, and the end-to-end eval expands the decoded
# (base, run) consensus back to sequence space and scores edit
# distance against the full truth.

RLE_QSTRAT = 12


def build_rle_set(out_dir, n_drafts, threads=4):
    """Per-draft RLE-compressed labelled features + eval manifest."""
    from medaka_tpu import mapping, rle
    from medaka_tpu.features import create_samples
    from medaka_tpu.io.fastx import FastaReader, FastaWriter
    from medaka_tpu.rle import RLEConverter

    ref_seq = FastaReader(WORKFLOW + "/reference.fasta").fetch(
        "lambda_5kb")
    contig = "lambda_5kb"
    truth_fa = str(out_dir / "truth.fasta")
    with FastaWriter(truth_fa) as fw:
        fw.write("truth_" + contig, ref_seq)

    rates = [0.002, 0.005, 0.01]
    depths = [20, 30, 45, 60]
    train, valid, evals = [], [], []
    for k in range(n_drafts):
        rng = np.random.default_rng(7000 + k)
        rate = rates[k % len(rates)]
        depth = depths[(k // len(rates)) % len(depths)]
        ddir = out_dir / "draft{:02d}".format(k)
        ddir.mkdir(exist_ok=True)
        draft_fa = str(ddir / "draft.fasta")
        draft_seq = mutate(ref_seq, rng, rate)
        with FastaWriter(draft_fa) as fw:
            fw.write(contig, draft_seq)
        compact_fa = str(ddir / "draft_compact.fasta")
        with FastaWriter(compact_fa) as fw:
            fw.write(contig, RLEConverter(draft_seq).compact_basecall)
        reads_fq = str(ddir / "reads.fq")
        subsample_reads(reads_fq, depth / 450.0, rng)
        reads_bam = str(ddir / "reads.bam")
        mapping.align_reads(
            reads_fq, draft_fa, reads_bam, threads=threads)
        truth_bam = str(ddir / "truth.bam")
        mapping.align_reads(truth_fa, draft_fa, truth_bam, md=True)
        rle_reads = str(ddir / "rle_reads.bam")
        rle.compress_bam(reads_bam, rle_reads, draft_fa, threads=threads)
        rle_truth = str(ddir / "rle_truth.bam")
        rle.compress_bam(truth_bam, rle_truth, draft_fa)
        feats = str(ddir / "feats.hdf5")
        n = create_samples(
            rle_reads, feats, truth_bam=rle_truth, threads=threads,
            feature_encoder_name="HardRLEFeatureEncoder",
            feature_encoder_args={"num_qstrat": RLE_QSTRAT},
            label_scheme_name="RLELabelScheme",
            chunk_len=1000, chunk_ovlp=200)
        held_out = k % 5 == 4
        (valid if held_out else train).append(feats)
        if held_out:
            evals.append({
                "dir": str(ddir), "rle_reads": rle_reads,
                "compact_draft": compact_fa, "contig": contig})
        print("rle draft {:02d}: rate={} depth={}x -> {} samples".format(
            k, rate, depth, n), flush=True)
    return train, valid, evals


def rle_eval(out_dir, model_path=None, threads=4):
    """End-to-end RLE consensus on held-out drafts: predict on the
    compressed BAM, stitch (RLE decode expands runs), score edit
    distance of the expanded consensus against the full truth."""
    from medaka_tpu import native, prediction, stitch
    from medaka_tpu.io.fastx import FastaReader

    out_dir = pathlib.Path(out_dir)
    sets = json.loads((out_dir / "dataset.json").read_text())
    truth_seq = FastaReader(str(out_dir / "truth.fasta")).fetch(
        "truth_lambda_5kb")
    model_path = model_path or str(
        out_dir / "train" / "model-best_val_loss.tar.gz")
    rows = []
    for ev in sets["eval"]:
        gdir = pathlib.Path(ev["dir"])
        probs = str(gdir / "eval_probs.hdf")
        if os.path.exists(probs):
            os.unlink(probs)
        prediction.predict(
            ev["rle_reads"], probs, model_path=model_path,
            batch_size=32, chunk_len=1000, chunk_overlap=200,
            bam_workers=2)
        cons_fa = str(gdir / "consensus.fasta")
        stitch.stitch_to_fasta(
            probs, ev["compact_draft"], cons_fa)
        cons = FastaReader(cons_fa).fetch(ev["contig"])
        edits = native.edit_distance(cons, truth_seq)
        q = -10.0 * np.log10(max(1e-9, edits / len(truth_seq)))
        rows.append({"draft": gdir.name, "edits": edits,
                     "q": round(q, 2)})
        print("rle eval {}".format(json.dumps(rows[-1])), flush=True)
    agg = {"rows": rows,
           "median_q": round(float(np.median([r["q"] for r in rows])), 2)}
    print("RLE_EVAL " + json.dumps(agg), flush=True)
    (out_dir / "rle_eval.json").write_text(json.dumps(agg))
    return agg


# ---------------------------------------------------------------------------
# Dwell-channel campaign (round 5): the reference's current read-level
# catalogue is rl_lstm384_dwells / rl_lstm384_no_dwells
# (``options.py:175-182``) with dwells extracted from basecaller ``mv``
# move tables (``medaka_read_matrix.c:169-228``). --condition=dwells
# builds mv-tagged synthetic reads whose errors are dwell-correlated
# (tests/mock_data.simulate_dwell_read), featurizes the same BAMs twice
# (include_dwells True/False), trains twin LatentSpaceLSTMs, and
# reports both Q-vs-majority results so the channel's value is
# measured, not assumed.


def build_dwell_set(out_dir, n_drafts, threads=4):
    """Per-draft labelled read-level features, with and without dwells."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from mock_data import simulate_dwell_read

    from medaka_tpu import mapping
    from medaka_tpu.features import create_samples
    from medaka_tpu.io.fastx import FastaWriter

    rng0 = np.random.default_rng(99)
    ref_seq = "".join(rng0.choice(list("ACGT"), size=20_000))
    contig = "dwellg"
    truth_fa = str(out_dir / "truth.fasta")
    with FastaWriter(truth_fa) as fw:
        fw.write("truth_" + contig, ref_seq)
    fwd_arr = np.frombuffer(ref_seq.encode(), np.uint8).copy()
    rc_arr = np.frombuffer(
        ref_seq.translate(_RC)[::-1].encode(), np.uint8).copy()

    rates = [0.002, 0.005, 0.01]
    depths = [20, 30, 45, 60]
    read_len = 3000
    sets = {"dwell": {"train": [], "valid": []},
            "nodwell": {"train": [], "valid": []}}
    for k in range(n_drafts):
        rng = np.random.default_rng(5000 + k)
        rate = rates[k % len(rates)]
        depth = depths[(k // len(rates)) % len(depths)]
        ddir = out_dir / "draft{:02d}".format(k)
        ddir.mkdir(exist_ok=True)
        draft_fa = str(ddir / "draft.fasta")
        with FastaWriter(draft_fa) as fw:
            fw.write(contig, mutate(ref_seq, rng, rate))
        reads_fq = str(ddir / "reads.fq")
        tags_by_read = {}
        n_reads = max(1, int(len(ref_seq) * depth / read_len))
        with open(reads_fq, "w") as fh:
            for i in range(n_reads):
                length = min(read_len, len(ref_seq) - 1)
                # reverse reads are simulated on the RC'd reference so
                # seq and mv are both in basecalled orientation
                arr = fwd_arr if rng.random() < 0.5 else rc_arr
                start = int(rng.integers(0, len(ref_seq) - length))
                seq, mv = simulate_dwell_read(arr, start, length, rng)
                name = "dw{}".format(i)
                tags_by_read[name] = {"mv": mv}
                fh.write("@{}\n{}\n+\n{}\n".format(
                    name, seq, "5" * len(seq)))
        reads_bam = str(ddir / "reads.bam")
        mapping.align_reads(
            reads_fq, draft_fa, reads_bam, threads=threads,
            tags_by_read=tags_by_read)
        truth_bam = str(ddir / "truth.bam")
        mapping.align_reads(truth_fa, draft_fa, truth_bam, md=True)
        held_out = k % 5 == 4
        for variant, include in (("dwell", True), ("nodwell", False)):
            feats = str(ddir / "feats_{}.hdf5".format(variant))
            n = create_samples(
                reads_bam, feats, truth_bam=truth_bam, threads=threads,
                feature_encoder_name="ReadAlignmentFeatureEncoder",
                feature_encoder_args={
                    "include_dwells": include, "max_reads": 100},
                chunk_len=500, chunk_ovlp=100)
            sets[variant]["valid" if held_out else "train"].append(feats)
        print("draft {:02d}: rate={} depth={}x -> {} samples".format(
            k, rate, depth, n), flush=True)
    return sets


def run_dwell_campaign(out_dir, n_drafts, epochs, lstm_size=128):
    """Twin training: use_dwells=True vs False on the same reads."""
    import jax
    import jax.numpy as jnp

    from medaka_tpu import training

    marker = out_dir / "dataset.json"
    if marker.exists():
        sets = json.loads(marker.read_text())
        print("Reusing dwell dataset.", flush=True)
    else:
        sets = build_dwell_set(out_dir, n_drafts)
        marker.write_text(json.dumps(sets))
    compute_dtype = (
        jnp.bfloat16 if jax.default_backend() != "cpu" else None)
    results = {}
    for variant, use_dwells in (("dwell", True), ("nodwell", False)):
        batcher = training.TrainBatcher(
            sets[variant]["train"], validation=sets[variant]["valid"],
            batch_size=32, seed=0)
        model, params = training.run_training(
            str(out_dir / ("train_" + variant)), batcher, epochs=epochs,
            model_dict={
                "type": "LatentSpaceLSTM",
                "kwargs": {"lstm_size": lstm_size,
                           "use_dwells": use_dwells}},
            compute_dtype=compute_dtype, early_stop_epochs=60)
        acc, mj = evaluate(batcher, model, params, compute_dtype)
        results[variant] = {
            "val_q": round(q_from_acc(acc), 2),
            "majority_q": round(q_from_acc(mj), 2),
            "q_margin": round(q_from_acc(acc) - q_from_acc(mj), 2)}
        print(variant, json.dumps(results[variant]), flush=True)
    results["dwell_advantage_q"] = round(
        results["dwell"]["val_q"] - results["nodwell"]["val_q"], 2)
    print("DWELL_CAMPAIGN " + json.dumps(results), flush=True)
    (out_dir / "dwell_results.json").write_text(json.dumps(results))
    return results


# ---------------------------------------------------------------------------
# Variant-calling campaign (round 5): the reference's second flagship
# workflow (``scripts/medaka_variant:1-182`` — "Haploid variant calling
# via neural networks" — and the diploid SNP decoder,
# ``medaka/labels.py:1088-1244``). Two conditions:
#
#   --condition=variant      hom SNVs + 1-3 bp indels planted into a
#                            synthetic genome; reads map to the
#                            *reference*; HaploidLabelScheme training;
#                            evaluated through the full
#                            ``medaka_tpu variant`` pipeline with
#                            SNP/indel precision/recall/F1 vs the truth
#                            VCF (the haploid workflow's own regime).
#   --condition=diploid_snp  het+hom SNVs on two haplotypes (50/50
#                            reads); DiploidLabelScheme (15-class)
#                            training with an HP-tagged truth BAM;
#                            evaluated through ``medaka_tpu snp``
#                            with SNP F1 + genotype concordance.


def apply_edits(ref_seq, edits):
    """Apply non-overlapping (pos, ref, alt) edits (VCF-style anchors)."""
    out, cur = [], 0
    for pos, ref, alt in sorted(edits):
        out.append(ref_seq[cur:pos])
        out.append(alt)
        cur = pos + len(ref)
    out.append(ref_seq[cur:])
    return "".join(out)


def plant_variants(ref_seq, rng, diploid=False, spacing=250):
    """Plant isolated variants; returns (hap_seqs, records).

    Records are dicts {pos (0-based), ref, alt, gt}; min separation
    60 bp keeps truth records independent so normalized exact-match
    scoring is unambiguous.
    """
    L = len(ref_seq)
    records = []
    p = 100
    while True:
        p += 60 + int(rng.integers(0, max(1, 2 * spacing - 60)))
        if p >= L - 120:
            break
        base = ref_seq[p]
        r = rng.random()
        if diploid or r < 0.6:  # SNV
            alt = str(rng.choice([b for b in "ACGT" if b != base]))
            ref, altseq = base, alt
        elif r < 0.8:  # insertion, 1-3 bp
            ins = "".join(rng.choice(list("ACGT"),
                                     size=int(rng.integers(1, 4))))
            ref, altseq = base, base + ins
        else:  # deletion, 1-3 bp
            dlen = int(rng.integers(1, 4))
            ref, altseq = ref_seq[p:p + 1 + dlen], base
        if diploid:
            gt = "0/1" if rng.random() < 0.5 else "1/1"
        else:
            gt = "1"
        records.append({"pos": p, "ref": ref, "alt": altseq, "gt": gt})
    if diploid:
        # assign each het record to one haplotype
        het_hap = {
            id(rec): int(rng.integers(0, 2))
            for rec in records if rec["gt"] == "0/1"}
        haps = []
        for h in (0, 1):
            edits = [
                (rec["pos"], rec["ref"], rec["alt"]) for rec in records
                if rec["gt"] == "1/1" or het_hap[id(rec)] == h]
            haps.append(apply_edits(ref_seq, edits))
    else:
        haps = [apply_edits(
            ref_seq, [(r["pos"], r["ref"], r["alt"]) for r in records])]
    return haps, records


def write_truth_vcf(path, contig, contig_len, records):
    from medaka_tpu import vcf as vcf_mod
    variants = [
        vcf_mod.Variant(
            contig, rec["pos"], rec["ref"], rec["alt"], qual=70.0,
            filt="PASS", genotype_data={"GT": rec["gt"]})
        for rec in records]
    with vcf_mod.VCFWriter(
            path, "w", version="4.1",
            contigs=["{},length={}".format(contig, contig_len)]) as vw:
        vw.write_variants(variants, sort=True)


def simulate_hap_reads(haps, depth, rng, out_fq, read_len=3000):
    """hp-bias reads drawn evenly from the given haplotype sequences."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from mock_data import simulate_hpbias_read
    n = 0
    with open(out_fq, "w") as fh:
        for h, hap in enumerate(haps):
            arr = np.frombuffer(hap.encode(), np.uint8).copy()
            n_reads = max(1, int(
                len(hap) * depth / (read_len * len(haps))))
            for i in range(n_reads):
                length = min(read_len, len(hap) - 1)
                start = int(rng.integers(0, len(hap) - length))
                seq = simulate_hpbias_read(arr, start, length, rng)
                if rng.random() < 0.5:
                    seq = seq.translate(_RC)[::-1]
                fh.write("@vr{}_{}\n{}\n+\n{}\n".format(
                    h, i, seq, "5" * len(seq)))
                n += 1
    return n


def build_variant_set(out_dir, n_genomes, condition, threads=4):
    """Per-genome labelled features + eval manifest for the workflow."""
    from medaka_tpu import common as mcommon
    from medaka_tpu import mapping
    from medaka_tpu.features import create_samples
    from medaka_tpu.io.fastx import FastaWriter

    diploid = condition == "diploid_snp"
    depths = [20, 30, 45, 60]
    genome_kb = 100
    train, valid, evals = [], [], []
    for k in range(n_genomes):
        rng = np.random.default_rng(3000 + k)
        contig = "vg{:02d}".format(k)
        ref_seq = "".join(rng.choice(list("ACGT"), size=genome_kb * 1000))
        gdir = out_dir / "genome{:02d}".format(k)
        gdir.mkdir(exist_ok=True)
        ref_fa = str(gdir / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write(contig, ref_seq)
        haps, records = plant_variants(ref_seq, rng, diploid=diploid)
        truth_vcf = str(gdir / "truth.vcf")
        write_truth_vcf(truth_vcf, contig, len(ref_seq), records)
        depth = depths[k % len(depths)]
        reads_fq = str(gdir / "reads.fq")
        simulate_hap_reads(haps, depth, rng, reads_fq)
        reads_bam = str(gdir / "reads.bam")
        mapping.align_reads(reads_fq, ref_fa, reads_bam, threads=threads)
        hap_bams = []
        for h, hap in enumerate(haps):
            hap_fa = str(gdir / "hap{}.fasta".format(h))
            with FastaWriter(hap_fa) as fw:
                fw.write("hap{}_{}".format(h, contig), hap)
            hap_bam = str(gdir / "hap{}.bam".format(h))
            mapping.align_reads(hap_fa, ref_fa, hap_bam, md=True)
            hap_bams.append(hap_bam)
        if diploid:
            truth_bam = str(gdir / "truth.bam")
            mcommon.tag_merge_bams(
                hap_bams, [1, 2], "HP", truth_bam, threads=threads)
        else:
            truth_bam = hap_bams[0]
        feats = str(gdir / "feats.hdf5")
        kwargs = {}
        if diploid:
            kwargs = {"label_scheme_name": "DiploidLabelScheme",
                      "truth_haplotag": "HP"}
        n = create_samples(
            reads_bam, feats, truth_bam=truth_bam, threads=threads,
            chunk_len=1000, chunk_ovlp=200, **kwargs)
        held_out = k % 5 == 4
        (valid if held_out else train).append(feats)
        if held_out:
            evals.append({
                "dir": str(gdir), "ref": ref_fa, "reads": reads_fq,
                "reads_bam": reads_bam, "truth_vcf": truth_vcf,
                "depth": depth})
        print("genome {:02d}: {} variants depth={}x -> {} samples".format(
            k, len(records), depth, n), flush=True)
    return train, valid, evals


def _norm_vcf(path, ref_seqs):
    """{(chrom, pos, ref, alt): zygosity} of normalized records."""
    from medaka_tpu import vcf as vcf_mod
    out = {}
    for var in vcf_mod.VCFReader(path).fetch():
        norm = var.normalize(ref_seqs[var.chrom])
        gt = norm.gt
        zyg = "hom"
        if gt is not None and len(set(gt)) > 1:
            zyg = "het"
        for alt in norm.alt:
            if alt in (".", norm.ref):
                continue
            out[(norm.chrom, norm.pos, norm.ref, alt)] = zyg
    return out


def score_vcf(truth_vcf, called_vcf, ref_fasta):
    """SNP/indel precision/recall/F1 + genotype concordance."""
    from medaka_tpu.io.fastx import FastaReader
    fa = FastaReader(ref_fasta)
    ref_seqs = {name: fa.fetch(name).upper() for name in fa.references}
    truth = _norm_vcf(truth_vcf, ref_seqs)
    called = _norm_vcf(called_vcf, ref_seqs)

    def kind(key):
        _, _, ref, alt = key
        return "snp" if len(ref) == 1 and len(alt) == 1 else "indel"

    res = {}
    for k in ("snp", "indel"):
        t = {key for key in truth if kind(key) == k}
        c = {key for key in called if kind(key) == k}
        if not t and not c:
            continue
        tp, fp, fn = len(t & c), len(c - t), len(t - c)
        prec = tp / max(1, tp + fp)
        rec = tp / max(1, tp + fn)
        f1 = 2 * prec * rec / max(1e-9, prec + rec)
        res[k] = {"tp": tp, "fp": fp, "fn": fn,
                  "precision": round(prec, 4), "recall": round(rec, 4),
                  "f1": round(f1, 4)}
    matched = set(truth) & set(called)
    gt_truth_known = [k for k in matched if truth[k] in ("het", "hom")]
    if gt_truth_known and any(called[k] for k in gt_truth_known):
        agree = sum(
            1 for k in gt_truth_known if called[k] == truth[k])
        res["gt_concordance"] = round(agree / len(gt_truth_known), 4)
    return res


def variant_eval(out_dir, model_path=None, condition=None,
                 batch_size=256, threads=4):
    """Full-workflow eval: predict + decode + score each eval genome."""
    from medaka_tpu import models, prediction, variant

    out_dir = pathlib.Path(out_dir)
    sets = json.loads((out_dir / "dataset.json").read_text())
    condition = condition or sets.get("condition", "variant")
    evals = sets["eval"]
    model_path = model_path or str(
        out_dir / "train" / "model-best_val_loss.tar.gz")
    diploid = condition == "diploid_snp"
    agg = {}
    for ev in evals:
        gdir = pathlib.Path(ev["dir"])
        probs = str(gdir / "eval_probs.hdf")
        if os.path.exists(probs):
            os.unlink(probs)
        prediction.predict(
            ev["reads_bam"], probs,
            model_path=models.resolve_model(model_path),
            batch_size=batch_size, chunk_len=1000, chunk_overlap=200,
            bam_workers=max(1, threads // 2))
        called = str(gdir / "called.vcf")
        if diploid:
            variant.snps_from_hdf(probs, ev["ref"], called)
        else:
            variant.variants_from_hdf(probs, ev["ref"], called)
        score = score_vcf(ev["truth_vcf"], called, ev["ref"])
        print("eval {} depth={}x {}".format(
            gdir.name, ev["depth"], json.dumps(score)), flush=True)
        for k, v in score.items():
            if isinstance(v, dict):
                for m in ("tp", "fp", "fn"):
                    agg.setdefault(k, {}).setdefault(m, 0)
                    agg[k][m] += v[m]
            else:
                agg.setdefault("gt_list", []).append(v)
    for k in ("snp", "indel"):
        if k not in agg:
            continue
        tp, fp, fn = agg[k]["tp"], agg[k]["fp"], agg[k]["fn"]
        prec = tp / max(1, tp + fp)
        rec = tp / max(1, tp + fn)
        agg[k].update({
            "precision": round(prec, 4), "recall": round(rec, 4),
            "f1": round(2 * prec * rec / max(1e-9, prec + rec), 4)})
    if "gt_list" in agg:
        agg["gt_concordance"] = round(
            float(np.mean(agg.pop("gt_list"))), 4)
    print("VARIANT_EVAL " + json.dumps(agg), flush=True)
    (out_dir / "variant_eval.json").write_text(json.dumps(agg, indent=1))
    return agg


def evaluate(batcher, model, params, compute_dtype, diploid_lut=None):
    """(model_acc, majority_acc) over the validation split.

    ``diploid_lut``: optional (5,) class-id LUT mapping the majority
    base argmax to the DiploidLabelScheme's homozygous class — the
    fair majority baseline for 15-class diploid labels (majority vote
    has no heterozygous call to make).
    """
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
        elif diploid_lut is not None:
            from medaka_tpu.models.majority import MajorityVoteModel
            probs = np.asarray(
                MajorityVoteModel().apply({}, batch["features"]))
            pred = diploid_lut[np.argmax(probs, axis=-1)]
            mj_c += float(np.sum(
                (pred == np.asarray(batch["labels"]))
                * np.asarray(batch["mask"])))
            mj_t += float(np.asarray(batch["mask"]).sum())
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
    cnn_size = 128
    kernels = None
    het_weight = None
    condition = "lambda"
    eval_only = "--eval-only" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--lstm-size"):
            lstm_size = int(a.split("=", 1)[1])
        if a.startswith("--cnn-size"):
            cnn_size = int(a.split("=", 1)[1])
        if a.startswith("--kernels"):
            kernels = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--condition"):
            condition = a.split("=", 1)[1]
        if a.startswith("--het-weight"):
            het_weight = float(a.split("=", 1)[1])
        if a.startswith("--cross-eval"):
            cross_eval(a.split("=", 1)[1].split(","))
            return
    out_dir = pathlib.Path(
        args[0] if len(args) > 0 else "/tmp/train_campaign")
    variant_cond = condition in ("variant", "diploid_snp")
    n_drafts = int(args[1]) if len(args) > 1 else (
        20 if variant_cond else 40)
    if condition == "rle" and len(args) <= 1:
        n_drafts = 40
    epochs = int(args[2]) if len(args) > 2 else 300
    out_dir.mkdir(parents=True, exist_ok=True)

    if eval_only:
        variant_eval(out_dir)
        return
    if condition == "dwells":
        run_dwell_campaign(
            out_dir, n_drafts if len(args) > 1 else 20, epochs,
            lstm_size=lstm_size)
        return

    marker = out_dir / "dataset.json"
    evals = []
    if marker.exists():
        sets = json.loads(marker.read_text())
        train, valid = sets["train"], sets["valid"]
        evals = sets.get("eval", [])
        condition = sets.get("condition", condition)
        variant_cond = condition in ("variant", "diploid_snp")
        print("Reusing dataset: {} train / {} valid files".format(
            len(train), len(valid)), flush=True)
    elif variant_cond:
        train, valid, evals = build_variant_set(
            out_dir, n_drafts, condition)
        marker.write_text(json.dumps({
            "train": train, "valid": valid, "eval": evals,
            "condition": condition}))
    elif condition == "rle":
        train, valid, evals = build_rle_set(out_dir, n_drafts)
        marker.write_text(json.dumps({
            "train": train, "valid": valid, "eval": evals,
            "condition": condition}))
    else:
        train, valid = build_draft_set(
            out_dir, n_drafts, read_level=read_level,
            condition=condition)
        marker.write_text(json.dumps(
            {"train": train, "valid": valid, "condition": condition}))

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
    use_lr_schedule = True
    if condition == "rle":
        # the compact lambda genome yields only ~160 train samples:
        # at batch 128 that is ~2 steps/epoch, so the 500-step LR
        # warmup would swallow the entire run (measured: stuck at
        # 0.65 train acc after 100 epochs). Small batches + constant
        # LR fit the tiny-dataset regime.
        batch_size = 16
        use_lr_schedule = False
    batcher = training.TrainBatcher(
        train, validation=valid, batch_size=batch_size, seed=0)
    compute_dtype = (
        jnp.bfloat16 if jax.default_backend() != "cpu" else None)
    model_dict = None
    diploid_lut = None
    class_weights = None
    if read_level:
        kwargs = {"lstm_size": lstm_size, "use_dwells": False}
        if cnn_size != 128:
            kwargs["cnn_size"] = cnn_size
        if kernels is not None:
            kwargs["kernel_sizes"] = kernels
        model_dict = {"type": "LatentSpaceLSTM", "kwargs": kwargs}
    elif condition == "diploid_snp":
        from medaka_tpu.labels import DiploidLabelScheme
        scheme = DiploidLabelScheme()
        model_dict = {
            "type": "GRUModel",
            "kwargs": {"num_features": 10,
                       "num_classes": scheme.num_classes,
                       "gru_size": 256}}
        diploid_lut = np.array(
            [scheme._encoding[(s, s)] for s in "*ACGT"])
        if het_weight is not None:
            # upweight the heterozygous classes (~1 per 1100 columns in
            # this condition) against the hom-dominated background
            class_weights = np.ones(scheme.num_classes, np.float32)
            for pair, cls in scheme._encoding.items():
                if pair[0] != pair[1]:
                    class_weights[cls] = het_weight
    elif condition == "rle":
        model_dict = {
            "type": "GRUModel",
            "kwargs": {"num_features": 10 * RLE_QSTRAT,
                       "num_classes": 1 + 4 * RLE_QSTRAT,
                       "gru_size": 256}}
    model, params = training.run_training(
        str(out_dir / "train"), batcher, epochs=epochs,
        model_dict=model_dict,
        compute_dtype=compute_dtype, early_stop_epochs=60,
        use_lr_schedule=use_lr_schedule, class_weights=class_weights)

    acc, mj = evaluate(
        batcher, model, params, compute_dtype, diploid_lut=diploid_lut)
    print(json.dumps({
        "val_acc": acc, "val_q": round(q_from_acc(acc), 2),
        "majority_acc": mj, "majority_q": round(q_from_acc(mj), 2),
        "q_margin": round(q_from_acc(acc) - q_from_acc(mj), 2)}),
        flush=True)
    if variant_cond:
        variant_eval(out_dir, condition=condition)
    elif condition == "rle":
        rle_eval(out_dir)


if __name__ == "__main__":
    main()
