"""Tests for datastore, stitch and variant workflow modules.

Mirrors the reference's test strategy (``test_datastore.py``,
``test_stitch.py``, ``test_variant.py``) including reading genuine
reference-written HDF5 fixtures from ``/root/reference/medaka/test/data``.
"""
import os

import numpy as np
import pytest

from medaka_tpu import common, datastore, stitch, variant
from medaka_tpu.common import POSITIONS_DTYPE, Region, Sample
from medaka_tpu.labels import HaploidLabelScheme

REF_DATA = "/root/reference/medaka/test/data"
STITCH_HDFS = [
    os.path.join(REF_DATA, "test_stitch_1.hdf"),
    os.path.join(REF_DATA, "test_stitch_2.hdf")]


def mock_positions(ref_with_gaps):
    """(major, minor) positions array for a gapped reference drawing."""
    pos = []
    major, minor = -1, 0
    for c in ref_with_gaps:
        if c == "*":
            minor += 1
        else:
            major += 1
            minor = 0
        pos.append((major, minor))
    return np.array(pos, dtype=POSITIONS_DTYPE)


def haploid_sample_from_labels(ls, ref, pri, pri_prob=0.6, sec=None,
                               sec_prob=0.3):
    """Build a Sample with label_probs voting for ``pri`` over ``ref``."""
    assert len(ref) == len(pri)
    pos = mock_positions(ref)
    probs = np.zeros((len(pos), len(ls._decoding)), dtype=np.float32)
    if sec is None:
        pri_prob = pri_prob + sec_prob
    for i, sym in enumerate(pri):
        probs[i, ls._encoding[(sym,)]] = pri_prob
        if sec is not None:
            probs[i, ls._encoding[(sec[i],)]] = sec_prob
        rest = np.flatnonzero(probs[i] == 0)
        other = ls._encoding[(ref[i],)]
        if other not in rest:
            other = rest[0]
        probs[i, other] = 1 - probs[i].sum()
    sample = Sample(
        ref_name="contig1", features=None, labels=None, ref_seq=None,
        positions=pos, label_probs=probs, depth=None)
    return sample, ref


def make_sample(name="contig1", start=0, n=100, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.array([(start + i, 0) for i in range(n)],
                   dtype=POSITIONS_DTYPE)
    probs = rng.random((n, 5)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    feats = rng.random((n, 10)).astype(np.float32)
    return Sample(
        ref_name=name, features=feats, labels=None, ref_seq=None,
        positions=pos, label_probs=probs,
        depth=np.full(n, 7, dtype=np.uint64))


class TestDataStore:
    def test_round_trip(self, tmp_path):
        path = str(tmp_path / "samples.hdf5")
        s1 = make_sample(start=0, seed=1)
        s2 = make_sample(start=90, seed=2)
        with datastore.DataStore(path, "w") as ds:
            ds.set_meta(HaploidLabelScheme(), "label_scheme")
            ds.write_sample(s1)
            ds.write_sample(s2)
            ds.write_sample(s2)  # dedup: idempotent append
            ds.write_registry()
        with datastore.DataStore(path, "r") as ds:
            assert ds.n_samples == 2
            got = ds.load_sample(s1.name)
            assert got == s1
            assert isinstance(
                ds.get_meta("label_scheme"), HaploidLabelScheme)

    def test_index_round_trip(self, tmp_path):
        paths = []
        for i, start in enumerate((0, 90)):
            p = str(tmp_path / "part{}.hdf5".format(i))
            with datastore.DataStore(p, "w") as ds:
                ds.set_meta(HaploidLabelScheme(), "label_scheme")
                ds.write_sample(make_sample(start=start, seed=start))
                ds.write_registry()
            paths.append(p)
        di = datastore.DataIndex(paths)
        assert len(di.samples) == 2
        assert di.regions == [Region("contig1", 0, 190)]
        got = list(di.yield_from_feature_files())
        assert [s.first_pos[0] for s in got] == [0, 90]
        # filtered yield
        got = list(di.yield_from_feature_files(
            regions=[Region("contig1", 100, 150)]))
        assert len(got) == 1

    def test_sharded_store_round_trip(self, tmp_path):
        """ShardedDataStore spreads samples over shard files; DataIndex
        expands the base file's manifest so single-path consumers see
        every sample with shared metadata."""
        path = str(tmp_path / "sharded.hdf5")
        samples = [
            make_sample(start=90 * i, seed=i) for i in range(7)]
        with datastore.ShardedDataStore(path, shards=3) as ds:
            ds.set_meta(HaploidLabelScheme(), "label_scheme")
            for s in samples:
                ds.write_sample(s)
            ds.write_registry()
        import glob
        shard_files = sorted(glob.glob(path + ".shard*"))
        assert len(shard_files) == 3
        # every shard got some samples (round-robin)
        for f in shard_files:
            with datastore.DataStore(f, "r") as one:
                assert one.n_samples >= 2
        di = datastore.DataIndex(path)  # single base path only
        assert len(di.samples) == len(samples)
        assert isinstance(
            di.get_metadata("label_scheme"), HaploidLabelScheme)
        got = list(di.yield_from_feature_files())
        assert sorted(s.first_pos[0] for s in got) == [
            90 * i for i in range(7)]

    def test_read_reference_file(self):
        di = datastore.DataIndex(STITCH_HDFS)
        assert len(di.samples) == 4
        scheme = di.get_metadata("label_scheme")
        assert isinstance(scheme, HaploidLabelScheme)
        samples = list(di.yield_from_feature_files(
            regions=[Region("utg1190", None, None)]))
        assert len(samples) == 2
        assert all(s.label_probs.shape == (10000, 5) for s in samples)


class FakeFasta:
    def __init__(self, lengths):
        self.lengths_map = dict(lengths)
        self._cache = {}

    @property
    def references(self):
        return list(self.lengths_map)

    def get_reference_length(self, ref):
        return self.lengths_map[ref]

    def fetch(self, ref, start=None, end=None):
        if ref not in self._cache:
            rng = np.random.default_rng(
                abs(hash(ref)) % np.iinfo(np.uint32).max)
            codes = np.frombuffer(b"ACGT", dtype=np.uint8)[
                rng.integers(0, 4, self.lengths_map[ref])]
            self._cache[ref] = codes.tobytes().decode()
        seq = self._cache[ref]
        return seq[start:end] if start is not None else seq

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass


class TestStitch:
    def test_collapse_neighbours(self):
        pieces = [
            (("c1", 0, 9), ["A" * 10], ["!" * 10]),
            (("c1", 10, 19), ["C" * 10], ["!" * 10]),
            (("c1", 30, 39), ["G" * 10], ["!" * 10]),
            (("c2", 0, 4), ["T" * 5], ["!" * 5])]
        out = list(stitch.collapse_neighbours(iter(pieces)))
        assert [p[0] for p in out] == [
            ("c1", 0, 19), ("c1", 30, 39), ("c2", 0, 4)]
        assert "".join(out[0][1]) == "A" * 10 + "C" * 10

    def test_fill_gaps_with_draft(self):
        draft = FakeFasta({"c1": 50})
        pieces = [
            (("c1", 10, 19), ["X" * 10], ["J" * 10]),
            (("c1", 30, 39), ["Y" * 10], ["J" * 10])]
        filled, gaps = stitch.fill_gaps(pieces, draft)
        (ref, start, stop), seqs, quals = filled[0]
        joined = "".join(seqs)
        dseq = draft.fetch("c1")
        assert joined[:10] == dseq[:10]
        assert joined[10:20] == "X" * 10
        assert joined[20:30] == dseq[20:30]
        assert joined[30:40] == "Y" * 10
        assert joined[40:] == dseq[40:]
        assert gaps["c1"] == [(0, 10), (20, 30), (40, 50)]
        assert "".join(quals) == (
            "!" * 10 + "J" * 10 + "!" * 10 + "J" * 10 + "!" * 10)

    def test_fill_gaps_with_char(self):
        draft = FakeFasta({"c1": 30})
        pieces = [(("c1", 10, 19), ["X" * 10], ["J" * 10])]
        filled, _ = stitch.fill_gaps(pieces, draft, fill_char="N")
        joined = "".join(filled[0][1])
        assert joined == "N" * 10 + "X" * 10 + "N" * 10

    def test_regression_reference_fixtures(self, tmp_path, monkeypatch):
        """Stitch genuine reference HDF fixtures; invariants from
        reference ``test_stitch.py:163-199``."""
        fake = FakeFasta({
            "utg1190": 11_010_000, "scaffold_117": 36_010_000,
            "missing_contig": 100})
        monkeypatch.setattr(stitch, "FastaReader", lambda p: fake)
        out = str(tmp_path / "consensus.fasta")
        stitch.stitch_to_fasta(
            STITCH_HDFS, "fake_draft", out, threads=2, qualities=False)
        seqs = {}
        with open(out) as fh:
            name = None
            for line in fh:
                if line.startswith(">"):
                    name = line[1:].strip()
                    seqs[name] = []
                else:
                    seqs[name].append(line.strip())
        seqs = {k: "".join(v) for k, v in seqs.items()}
        assert set(seqs) == {"utg1190", "scaffold_117", "missing_contig"}
        # uncovered contig copied verbatim
        assert seqs["missing_contig"] == fake.fetch("missing_contig")
        # flanks outside the polished windows come from the draft
        assert seqs["utg1190"][:100] == fake.fetch("utg1190")[:100]
        # polished span exists and is ACGT-only
        assert set(seqs["utg1190"]) <= set("ACGT")
        bed = out + ".gaps_in_draft_coords.bed"
        lines = open(bed).read().splitlines()
        assert any(li.startswith("utg1190\t0\t10994249") for li in lines)


class TestJoinSamples:
    def setup_method(self):
        self.ls = HaploidLabelScheme()

    indel = "CATGCG****TGCATCG"
    sub = "CATGCGATACTGCATCG"
    ref = "CATGCGTCGATGCATCG"
    mix = "CATGCGAT**TGCATCG"

    def _check(self, refs_calls, inp_slices, exp_slices, last_flags):
        for ref, call in refs_calls:
            sample, ref_seq = haploid_sample_from_labels(self.ls, ref, call)
            inp = [sample.slice(sl) for sl in inp_slices]
            exp = [sample.slice(sl) for sl in exp_slices]
            joined = list(variant.join_samples(
                zip(inp, last_flags, [False] * len(last_flags)),
                ref_seq.replace("*", ""), self.ls))
            assert len(joined) == len(exp)
            for expt, got in zip(exp, joined):
                assert got.name == expt.name
                assert got == expt

    def test_not_spanning(self):
        self._check(
            [(self.ref, self.indel), (self.ref, self.sub),
             (self.indel, self.ref), (self.indel, self.mix)],
            [slice(0, 4), slice(4, 12), slice(12, None)],
            [slice(0, 3), slice(3, 11), slice(11, None)],
            [False, False, True])

    def test_spanning(self):
        self._check(
            [(self.ref, self.indel), (self.ref, self.sub),
             (self.indel, self.ref), (self.indel, self.mix)],
            [slice(0, 8), slice(8, None)],
            [slice(0, 5), slice(5, None)],
            [False, True])

    def test_no_pos_same(self):
        self._check(
            [(self.ref, self.indel), (self.ref, self.sub),
             (self.ref, self.mix), (self.indel, self.ref),
             (self.indel, self.mix)],
            [slice(0, 6), slice(6, 10), slice(10, None)],
            [slice(0, 5), slice(5, None)],
            [False, False, True])

    def test_gh384_insertion_only_chunk(self):
        ref_ = "C*******ATGCGTCGATGCATCG"
        call = "CCCCCCCCATGCGTCGATGCATCG"
        sample, ref_seq = haploid_sample_from_labels(self.ls, ref_, call)
        inp = [sample.slice(slice(0, 8)), sample.slice(slice(8, None))]
        for s in variant.join_samples(
                zip(inp, [False, True], [False, False]),
                ref_seq.replace("*", ""), self.ls):
            assert s.size > 0

    def test_missing_last_raises(self):
        sample, ref_seq = haploid_sample_from_labels(
            self.ls, self.ref, self.sub)
        with pytest.raises(ValueError):
            list(variant.join_samples(
                zip([sample], [False], [False]),
                ref_seq.replace("*", ""), self.ls))


class TestVariantsFromHdf:
    def test_end_to_end(self, tmp_path, monkeypatch):
        """Write probs voting for known variants, decode to VCF."""
        ls = HaploidLabelScheme()
        ref_ = "CATGCGTCGATGCATCGACCGTTGC"
        call = "CATACGTCGA*GCATCGACCGTTGC"  # sub at 3, del at 10
        sample, _ = haploid_sample_from_labels(ls, ref_, call)
        path = str(tmp_path / "probs.hdf5")
        with datastore.DataStore(path, "w") as ds:
            ds.set_meta(ls, "label_scheme")
            ds.write_sample(sample)
            ds.write_registry()
        fake = FakeFasta({"contig1": len(ref_)})
        fake.fetch = lambda r, s=None, e=None: ref_
        monkeypatch.setattr(variant, "FastaReader", lambda p: fake)
        out = str(tmp_path / "out.vcf")
        variant.variants_from_hdf(path, "fake_ref", out)
        from medaka_tpu.vcf import VCFReader
        records = list(VCFReader(out).fetch())
        assert len(records) == 2
        subv = records[0]
        assert (subv.pos, subv.ref, subv.alt) == (3, "G", ["A"])
        delv = records[1]
        assert (delv.pos, delv.ref, delv.alt) == (9, "AT", ["A"])

    def test_samples_to_bed(self, tmp_path):
        path = str(tmp_path / "probs.hdf5")
        with datastore.DataStore(path, "w") as ds:
            ds.write_sample(make_sample(start=0))
            ds.write_sample(make_sample(start=99))
            ds.write_sample(make_sample(start=300))
            ds.write_registry()
        out = str(tmp_path / "out.bed")
        variant.samples_to_bed(path, out)
        lines = open(out).read().splitlines()
        assert lines == ["contig1\t0\t199", "contig1\t300\t400"]


class TestVcfFromFasta:
    def test_round_trip(self, tmp_path):
        """ref + mutated consensus -> VCF -> apply -> consensus again."""
        rng = np.random.default_rng(21)
        ref_seq = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, 30000)].tobytes().decode()
        cons = list(ref_seq)
        cons[5000] = "A" if ref_seq[5000] != "A" else "C"
        del cons[12000:12002]
        cons.insert(20000, "T")
        cons = "".join(cons)
        ref_path = str(tmp_path / "ref.fasta")
        cons_path = str(tmp_path / "cons.fasta")
        with open(ref_path, "w") as fh:
            fh.write(">chr1\n{}\n".format(ref_seq))
        with open(cons_path, "w") as fh:
            fh.write(">chr1\n{}\n".format(cons))
        prefix = str(tmp_path / "out")
        vcf_path = variant.vcf_from_fasta(
            cons_path, ref_path, prefix, chunk_size=8000, pad=1000)
        from medaka_tpu.vcf import VCFReader
        records = list(VCFReader(vcf_path).fetch())
        assert len(records) == 3
        rebuilt = variant.apply_variants(records, ref_seq)
        assert rebuilt == cons
        cov = open(prefix + "_coverage.bed").read().strip()
        assert cov == "chr1\t0\t30000"
        assert open(prefix + "_coverage_gaps.bed").read() == ""
        import os
        assert os.path.exists(prefix + ".bam")


def test_truncated_hdf5_clear_error(tmp_path):
    """A mid-write-killed output file raises a clear message on reopen."""
    import h5py
    import pytest

    from medaka_tpu.datastore import DataStore

    p = str(tmp_path / "x.hdf5")
    with h5py.File(p, "w") as f:
        f.create_dataset("a", data=[1, 2, 3])
    with open(p, "r+b") as f:
        f.truncate(96)
    with pytest.raises(OSError, match="truncated HDF5"):
        DataStore(p, "a")


class TestTrainedModelFullLoop:
    """The bundled trained GRU polishes the real workflow reads to
    within a handful of edits of the high-quality draft — the
    framework's train -> infer -> decode loop is self-consistent end
    to end.

    The bundle is the round-3 campaign model
    (tests/perf/train_campaign.py: labelled data built entirely with
    own tools from the 450x workflow reads — synthetic-mutation
    drafts, 20-60x downsamples, own mapper + TruthAlignment), which
    reaches validation Q32.7 vs the Q29.4 majority-vote baseline
    (+3.3Q) and polishes this workflow to 6 edits (the round-2
    reference-features model managed Q28.0 and 7 edits). Identical on
    the TPU bf16 and CPU f32 backends."""

    def test_bundled_model_polishes_workflow(self, tmp_path):
        from medaka_tpu import mapping, models, native
        from medaka_tpu.io.fastx import FastaReader

        WORKFLOW = "/root/reference/medaka/test/data/workflow"
        bundle = models.load_model(
            models.resolve_model("gru256_lambda_demo"))
        out = mapping.consensus_workflow(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            str(tmp_path / "wf"), model=bundle.model,
            params=bundle.params,
            feature_encoder=bundle.feature_encoder,
            label_scheme=bundle.label_scheme,
            threads=4, batch_size=8, chunk_len=2000, chunk_ovlp=200)
        cons = FastaReader(out).fetch("lambda_5kb")
        draft = FastaReader(
            WORKFLOW + "/reference.fasta").fetch("lambda_5kb")
        assert native.edit_distance(cons, draft) <= 6

    def test_cross_genome_generalisation(self, tmp_path):
        """The lambda-trained counts bundle generalises to an unseen
        random genome: full consensus workflow (map -> featurize ->
        infer -> stitch) over synthetic ~96%-identity reads of a
        100 kb genome the model never saw, pinned at Q>=30 (<=0.1%
        edits). Promotes the round-3 8 Mb CLI smoke (Q33 on the real
        chip) to a committed test at CPU-friendly scale."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from mock_data import simulate_synth_read

        from medaka_tpu import mapping, models, native
        from medaka_tpu.io.fastx import FastaReader, FastaWriter

        rng = np.random.default_rng(123)
        bases = np.frombuffer(b"ACGT", np.uint8)
        ref_arr = bases[rng.integers(0, 4, 100_000)]
        ref_seq = ref_arr.tobytes().decode()
        ref_fa = str(tmp_path / "genome.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("genomeX", ref_seq)
        reads_fq = str(tmp_path / "reads.fq")
        with open(reads_fq, "w") as fh:
            for i in range(int(100_000 * 30 / 3000)):
                start = int(rng.integers(0, len(ref_seq) - 3000))
                seq, _ = simulate_synth_read(ref_arr, start, 3000, rng)
                fh.write("@sr{}\n{}\n+\n{}\n".format(
                    i, seq, "5" * len(seq)))

        bundle = models.load_model(
            models.resolve_model("gru256_lambda_demo"))
        out = mapping.consensus_workflow(
            reads_fq, ref_fa, str(tmp_path / "wf"),
            model=bundle.model, params=bundle.params,
            feature_encoder=bundle.feature_encoder,
            label_scheme=bundle.label_scheme,
            threads=4, batch_size=32, chunk_len=4000, chunk_ovlp=400)
        cons = FastaReader(out).fetch("genomeX")
        edits = native.edit_distance(cons, ref_seq)
        # Q30 = 0.1% of 100 kb; the round-3 8 Mb run measured Q33
        assert edits <= 100, "cross-genome edit rate {} > Q30".format(
            edits)

    def test_gcrep_bundle_beats_majority_on_systematic_errors(
            self, tmp_path):
        """The second-condition (gcrep) bundle fixes errors majority
        vote cannot: on reads with homopolymer-biased deletions (the
        correlated real-nanopore error mode), majority consensus
        inherits the bias while the gcrep-trained model corrects it.
        Pinned claim: model consensus has at most half the majority
        consensus's edits over the same pileup (measured 26 vs 141 =
        Q31.9 vs Q24.5 on this 40 kb genome; 2x2 quality matrix in
        PARITY.md; condition recipe tests/perf/train_campaign.py)."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from mock_data import simulate_hpbias_read

        from medaka_tpu import mapping, models, native
        from medaka_tpu.io.fastx import FastaReader, FastaWriter
        from medaka_tpu.models.majority import MajorityVoteModel

        rng = np.random.default_rng(99)
        bases = np.frombuffer(b"ACGT", np.uint8)
        # GC-skewed like the training condition, unseen sequence
        ref_arr = bases[rng.choice(4, 40_000, p=[.15, .35, .35, .15])]
        ref_seq = ref_arr.tobytes().decode()
        ref_fa = str(tmp_path / "genome.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("gx", ref_seq)
        rc = str.maketrans("ACGT", "TGCA")
        reads_fq = str(tmp_path / "reads.fq")
        with open(reads_fq, "w") as fh:
            for i in range(int(40_000 * 30 / 3000)):
                start = int(rng.integers(0, len(ref_seq) - 3000))
                seq = simulate_hpbias_read(ref_arr, start, 3000, rng)
                if rng.random() < 0.5:
                    seq = seq.translate(rc)[::-1]
                fh.write("@sr{}\n{}\n+\n{}\n".format(
                    i, seq, "5" * len(seq)))

        bundle = models.load_model(
            models.resolve_model("gru256_gcrep_demo"))
        edits = {}
        for name, model, params in (
                ("model", bundle.model, bundle.params),
                ("majority", MajorityVoteModel(), {})):
            out = mapping.consensus_workflow(
                reads_fq, ref_fa, str(tmp_path / ("wf_" + name)),
                model=model, params=params,
                feature_encoder=bundle.feature_encoder,
                label_scheme=bundle.label_scheme,
                threads=4, batch_size=32, chunk_len=4000,
                chunk_ovlp=400)
            edits[name] = native.edit_distance(
                FastaReader(out).fetch("gx"), ref_seq)
        assert edits["model"] * 2 <= edits["majority"], edits

    def test_bundled_read_level_model_polishes_workflow(self, tmp_path):
        """The round-4 read-level (LatentSpaceLSTM) campaign bundle —
        validation Q39.7 vs the Q29.03 majority baseline (+10.67Q) on
        held-out 20-60x drafts — runs the same full loop: map ->
        read-level featurize (max_reads 100 of the 450x pile) ->
        infer -> stitch. Measured 11 edits from the high-quality
        draft at this depth cap (the counts GRU pins 6 with the full
        pile); pinned with headroom against mapper drift."""
        from medaka_tpu import mapping, models, native
        from medaka_tpu.io.fastx import FastaReader

        WORKFLOW = "/root/reference/medaka/test/data/workflow"
        bundle = models.load_model(
            models.resolve_model("rl_lstm128_lambda_demo"))
        out = mapping.consensus_workflow(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            str(tmp_path / "wf_rl"), model=bundle.model,
            params=bundle.params,
            feature_encoder=bundle.feature_encoder,
            label_scheme=bundle.label_scheme,
            threads=4, batch_size=8, chunk_len=500, chunk_ovlp=100)
        cons = FastaReader(out).fetch("lambda_5kb")
        draft = FastaReader(
            WORKFLOW + "/reference.fasta").fetch("lambda_5kb")
        assert native.edit_distance(cons, draft) <= 15


class TestDirectConsensus:
    """The on-device decode fast path (`consensus --direct`) must be
    byte-identical to the HDF5 probability round trip: same fastq
    bytes, same gaps bed. SURVEY §7 sketch item 4 — the chip computes
    argmax + phred qual (3 bytes/column fetched instead of 10) and
    DirectStitcher streams the decode straight to fastx."""

    def test_byte_identical_on_workflow_data(self, tmp_path):
        from medaka_tpu import mapping, models

        WORKFLOW = "/root/reference/medaka/test/data/workflow"
        bundle = models.load_model(
            models.resolve_model("gru256_lambda_demo"))
        kw = dict(
            model=bundle.model, params=bundle.params,
            feature_encoder=bundle.feature_encoder,
            label_scheme=bundle.label_scheme,
            threads=1, batch_size=8, chunk_len=2000, chunk_ovlp=200,
            qualities=True)
        out_hdf = mapping.consensus_workflow(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            str(tmp_path / "wf_hdf"), **kw)
        out_direct = mapping.consensus_workflow(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            str(tmp_path / "wf_direct"), direct=True, **kw)
        with open(out_hdf, "rb") as a, open(out_direct, "rb") as b:
            assert a.read() == b.read()
        suffix = ".gaps_in_draft_coords.bed"
        with open(out_hdf + suffix, "rb") as a, \
                open(out_direct + suffix, "rb") as b:
            assert a.read() == b.read()

    def test_byte_identical_multiwindow(self, tmp_path, monkeypatch):
        """Shrunken bam_chunk and stitch windows force the hard paths:
        samples spanning work-region overlaps, region completion events
        arriving out of order, and window flushes that need samples
        from two neighbouring work regions."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from mock_data import simulate_synth_read

        from medaka_tpu import models, prediction
        from medaka_tpu.io.fastx import FastaWriter

        rng = np.random.default_rng(7)
        bases = np.frombuffer(b"ACGT", np.uint8)
        ref_arr = bases[rng.integers(0, 4, 30_000)]
        ref_seq = ref_arr.tobytes().decode()
        ref_fa = str(tmp_path / "genome.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("genomeY", ref_seq)
        reads_fq = str(tmp_path / "reads.fq")
        with open(reads_fq, "w") as fh:
            for i in range(int(30_000 * 25 / 3000)):
                start = int(rng.integers(0, len(ref_seq) - 3000))
                seq, _ = simulate_synth_read(ref_arr, start, 3000, rng)
                fh.write("@sr{}\n{}\n+\n{}\n".format(
                    i, seq, "5" * len(seq)))
        bam = str(tmp_path / "reads.bam")
        from medaka_tpu import mapping
        mapping.align_reads(reads_fq, ref_fa, bam, threads=2)

        monkeypatch.setattr(stitch, "MAX_REGION_SIZE", 7000)
        bundle = models.load_model(
            models.resolve_model("gru256_lambda_demo"))
        kw = dict(
            model=bundle.model, params=bundle.params,
            feature_encoder=bundle.feature_encoder,
            label_scheme=bundle.label_scheme,
            batch_size=8, chunk_len=1000, chunk_overlap=100,
            bam_chunk=9000, bam_workers=3)
        probs = str(tmp_path / "probs.hdf")
        prediction.predict(bam, probs, **kw)
        out_hdf = str(tmp_path / "cons_hdf.fastq")
        stitch.stitch_to_fasta(
            probs, ref_fa, out_hdf, qualities=True)
        out_direct = str(tmp_path / "cons_direct.fastq")
        prediction.predict_direct(
            bam, out_direct, ref_fa, qualities=True, **kw)
        with open(out_hdf, "rb") as a, open(out_direct, "rb") as b:
            assert a.read() == b.read()
        suffix = ".gaps_in_draft_coords.bed"
        with open(out_hdf + suffix, "rb") as a, \
                open(out_direct + suffix, "rb") as b:
            assert a.read() == b.read()


class TestVariantCallingFullLoop:
    """The bundled variant-calling model (round-5 campaign: 20 planted
    diploid-free genomes, reads mapped to the *reference*, trained on
    the chip) proves the second flagship workflow with measured
    quality: the aggregate over held-out genomes at 20-60x was
    SNP P/R/F1 = 0.977/0.999/0.988 and indel 0.917/0.977/0.946 through
    the full `medaka_tpu variant` pipeline (reference workflow:
    scripts/medaka_variant:1-182; decode medaka/labels.py:889-1014).
    This pins floors with margin on a fresh unseen genome at CPU scale.
    """

    def test_variant_workflow_precision_recall(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "perf"))
        import train_campaign as tc

        from medaka_tpu import mapping, models, prediction, variant
        from medaka_tpu.io.fastx import FastaWriter

        rng = np.random.default_rng(31337)
        ref_seq = "".join(rng.choice(list("ACGT"), size=40_000))
        ref_fa = str(tmp_path / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("pinctg", ref_seq)
        haps, records = tc.plant_variants(ref_seq, rng, diploid=False)
        truth_vcf = str(tmp_path / "truth.vcf")
        tc.write_truth_vcf(truth_vcf, "pinctg", len(ref_seq), records)
        reads_fq = str(tmp_path / "reads.fq")
        tc.simulate_hap_reads(haps, 30, rng, reads_fq)
        bam = str(tmp_path / "reads.bam")
        mapping.align_reads(reads_fq, ref_fa, bam, threads=2)

        probs = str(tmp_path / "probs.hdf")
        prediction.predict(
            bam, probs,
            model_path=models.resolve_model("gru256_variant_demo"),
            batch_size=8, chunk_len=1000, chunk_overlap=200,
            bam_workers=2)
        called = str(tmp_path / "called.vcf")
        variant.variants_from_hdf(probs, ref_fa, called)
        score = tc.score_vcf(truth_vcf, called, ref_fa)
        # measured 0.977/0.999/0.988 SNP and 0.917/0.977/0.946 indel on
        # the campaign's held-out genomes; floors leave noise margin
        # for the smaller genome
        assert score["snp"]["precision"] >= 0.93, score
        assert score["snp"]["recall"] >= 0.97, score
        assert score["snp"]["f1"] >= 0.95, score
        assert score["indel"]["f1"] >= 0.85, score


class TestDiploidSnpFullLoop:
    """The bundled diploid SNP model — the first trained
    DiploidLabelScheme (15-class) model in this framework (round-5
    campaign: het+hom SNVs on two haplotypes, 50/50 reads, HP-tagged
    truth BAMs) — measured through `medaka_tpu snp` on held-out
    genomes: aggregate SNP P/R/F1 = 0.968/0.894/0.929, genotype
    concordance 0.930 (0.991/0.918/0.953 and 0.980 at 60x). The
    residual recall gap is characterized: misses are het sites argmax-
    decoded as hom-ref (the reference's diploid decode is argmax too,
    labels.py:1088-1244). Floors pinned with margin at 30x."""

    def test_diploid_snp_precision_recall(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "perf"))
        import train_campaign as tc

        from medaka_tpu import common as mcommon
        from medaka_tpu import mapping, models, prediction
        from medaka_tpu.io.fastx import FastaWriter

        rng = np.random.default_rng(2718)
        ref_seq = "".join(rng.choice(list("ACGT"), size=40_000))
        ref_fa = str(tmp_path / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("dipctg", ref_seq)
        haps, records = tc.plant_variants(ref_seq, rng, diploid=True)
        truth_vcf = str(tmp_path / "truth.vcf")
        tc.write_truth_vcf(truth_vcf, "dipctg", len(ref_seq), records)
        reads_fq = str(tmp_path / "reads.fq")
        tc.simulate_hap_reads(haps, 30, rng, reads_fq)
        bam = str(tmp_path / "reads.bam")
        mapping.align_reads(reads_fq, ref_fa, bam, threads=2)

        probs = str(tmp_path / "probs.hdf")
        prediction.predict(
            bam, probs,
            model_path=models.resolve_model("gru256_diploid_snp_demo"),
            batch_size=8, chunk_len=1000, chunk_overlap=200,
            bam_workers=2)
        called = str(tmp_path / "called.vcf")
        variant.snps_from_hdf(probs, ref_fa, called)
        score = tc.score_vcf(truth_vcf, called, ref_fa)
        assert score["snp"]["precision"] >= 0.90, score
        assert score["snp"]["recall"] >= 0.82, score
        assert score["snp"]["f1"] >= 0.88, score
        assert score["gt_concordance"] >= 0.85, score

    def test_het_rescue_improves_recall(self, tmp_path):
        """Same loop decoded twice: --het_rescue 0.1 must beat plain
        argmax on recall without giving up the precision floor
        (campaign aggregate: F1 0.929 -> 0.967, PARITY.md)."""
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "perf"))
        import train_campaign as tc

        from medaka_tpu import mapping, models, prediction
        from medaka_tpu.io.fastx import FastaWriter

        rng = np.random.default_rng(1618)
        ref_seq = "".join(rng.choice(list("ACGT"), size=40_000))
        ref_fa = str(tmp_path / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("dipctg", ref_seq)
        haps, records = tc.plant_variants(ref_seq, rng, diploid=True)
        truth_vcf = str(tmp_path / "truth.vcf")
        tc.write_truth_vcf(truth_vcf, "dipctg", len(ref_seq), records)
        reads_fq = str(tmp_path / "reads.fq")
        tc.simulate_hap_reads(haps, 30, rng, reads_fq)
        bam = str(tmp_path / "reads.bam")
        mapping.align_reads(reads_fq, ref_fa, bam, threads=2)
        probs = str(tmp_path / "probs.hdf")
        prediction.predict(
            bam, probs,
            model_path=models.resolve_model("gru256_diploid_snp_demo"),
            batch_size=8, chunk_len=1000, chunk_overlap=200,
            bam_workers=2)

        plain_vcf = str(tmp_path / "plain.vcf")
        variant.snps_from_hdf(probs, ref_fa, plain_vcf)
        rescue_vcf = str(tmp_path / "rescue.vcf")
        variant.snps_from_hdf(
            probs, ref_fa, rescue_vcf, het_rescue=0.1)
        plain = tc.score_vcf(truth_vcf, plain_vcf, ref_fa)
        rescued = tc.score_vcf(truth_vcf, rescue_vcf, ref_fa)
        assert rescued["snp"]["recall"] > plain["snp"]["recall"], (
            plain, rescued)
        assert rescued["snp"]["f1"] >= plain["snp"]["f1"], (plain, rescued)
        assert rescued["snp"]["precision"] >= 0.90, rescued


class TestRLEFullLoop:
    """The RLE (run-length-encoded) model family end to end — the last
    previously-untraversed model surface (reference medaka/rle.py +
    RLELabelScheme, labels.py:1247-1324). The round-5 campaign trains a
    49-class GRU on HardRLE (qscore-stratified) features of
    RLE-compressed real workflow reads; held-out drafts decode to
    expanded consensus at 2-5 edits from the 5 kb truth (median Q31.6).
    This pins the loop at reduced depth with margin."""

    def test_rle_consensus_polishes(self, tmp_path):
        import sys

        here = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(here, "perf"))
        import train_campaign as tc

        from medaka_tpu import mapping, models, native, prediction, rle
        from medaka_tpu import stitch as stitch_mod
        from medaka_tpu.io.fastx import FastaReader, FastaWriter
        from medaka_tpu.rle import RLEConverter

        WORKFLOW = "/root/reference/medaka/test/data/workflow"
        truth = FastaReader(WORKFLOW + "/reference.fasta").fetch(
            "lambda_5kb")
        rng = np.random.default_rng(4242)
        draft_seq = tc.mutate(truth, rng, 0.005)
        draft_fa = str(tmp_path / "draft.fasta")
        with FastaWriter(draft_fa) as fw:
            fw.write("lambda_5kb", draft_seq)
        compact_fa = str(tmp_path / "draft_compact.fasta")
        with FastaWriter(compact_fa) as fw:
            fw.write("lambda_5kb",
                     RLEConverter(draft_seq).compact_basecall)
        reads_fq = str(tmp_path / "reads.fq")
        tc.subsample_reads(reads_fq, 20 / 450.0, rng)
        bam = str(tmp_path / "reads.bam")
        mapping.align_reads(reads_fq, draft_fa, bam, threads=4)
        rle_bam = str(tmp_path / "rle_reads.bam")
        rle.compress_bam(bam, rle_bam, draft_fa, threads=4)

        probs = str(tmp_path / "probs.hdf")
        prediction.predict(
            rle_bam, probs,
            model_path=models.resolve_model("gru256_rle_demo"),
            batch_size=8, chunk_len=1000, chunk_overlap=200,
            bam_workers=2)
        cons_fa = str(tmp_path / "cons.fasta")
        stitch_mod.stitch_to_fasta(probs, compact_fa, cons_fa)
        cons = FastaReader(cons_fa).fetch("lambda_5kb")
        d_draft = native.edit_distance(draft_seq, truth)
        d_cons = native.edit_distance(cons, truth)
        # campaign: 2-5 edits at 20-60x; generous margin at 20x
        assert d_cons <= 12, (d_cons, d_draft)
        assert d_cons < 0.5 * d_draft, (d_cons, d_draft)


class TestDirectAndRescueGuards:
    """Misuse guards found by round-5 self-review: --direct must refuse
    schemes whose decode is not plain symbols[argmax], and --het_rescue
    must refuse non-diploid probabilities instead of silently no-oping."""

    def test_direct_refuses_rle_scheme(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from mock_data import create_simple_bam

        from medaka_tpu import prediction
        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.labels import RLELabelScheme
        from medaka_tpu.models.majority import MajorityVoteModel

        bam = create_simple_bam(str(tmp_path / "simple.bam"))
        with pytest.raises(ValueError, match="direct"):
            prediction.predict_direct(
                bam, str(tmp_path / "out.fasta"),
                str(tmp_path / "draft.fasta"),
                model=MajorityVoteModel(), params={},
                feature_encoder=CountsFeatureEncoder(),
                label_scheme=RLELabelScheme())

    def test_het_rescue_refuses_haploid_probs(self, tmp_path):
        from medaka_tpu.io.fastx import FastaWriter

        ls = HaploidLabelScheme()
        pos = np.zeros(5, dtype=POSITIONS_DTYPE)
        pos["major"] = np.arange(5)
        probs = np.full((5, 5), 0.01, np.float32)
        probs[:, 1] = 0.96
        s = Sample("ctg", None, None, None, pos, probs,
                   np.full(5, 30))
        hdf = str(tmp_path / "probs.hdf")
        with datastore.DataStore(hdf, "w") as ds:
            ds.set_meta(ls, "label_scheme")
            ds.write_sample(s)
        ref_fa = str(tmp_path / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("ctg", "ACGTA")
        with pytest.raises(ValueError, match="diploid"):
            variant.snps_from_hdf(
                [hdf], ref_fa, str(tmp_path / "o.vcf"), het_rescue=0.1)


class TestWeightedDiploidSnp:
    """The het-weighted (class_weights het x10) diploid bundle: the
    training-side fix for the class-imbalance recall gap. Plain argmax
    decode measures aggregate SNP P/R/F1 0.940/0.991/0.965 with GT
    concordance 0.994 on the held-out genomes (0.95+/0.997/0.973+ and
    GT 0.997 at >=30x) — zygosity calling is essentially solved by the
    weighting, where the parity-trained bundle needed --het_rescue and
    still sat at GT 0.938. Rescue must NOT be stacked on this model
    (measured: precision 0.940 -> 0.877)."""

    def test_weighted_bundle_floors(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(__file__), "perf"))
        import train_campaign as tc

        from medaka_tpu import mapping, models, prediction
        from medaka_tpu.io.fastx import FastaWriter

        rng = np.random.default_rng(97531)
        ref_seq = "".join(rng.choice(list("ACGT"), size=40_000))
        ref_fa = str(tmp_path / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("dipctg", ref_seq)
        haps, records = tc.plant_variants(ref_seq, rng, diploid=True)
        truth_vcf = str(tmp_path / "truth.vcf")
        tc.write_truth_vcf(truth_vcf, "dipctg", len(ref_seq), records)
        reads_fq = str(tmp_path / "reads.fq")
        tc.simulate_hap_reads(haps, 30, rng, reads_fq)
        bam = str(tmp_path / "reads.bam")
        mapping.align_reads(reads_fq, ref_fa, bam, threads=2)
        probs = str(tmp_path / "probs.hdf")
        prediction.predict(
            bam, probs,
            model_path=models.resolve_model(
                "gru256_diploid_snp_w10_demo"),
            batch_size=8, chunk_len=1000, chunk_overlap=200,
            bam_workers=2)
        called = str(tmp_path / "called.vcf")
        variant.snps_from_hdf(probs, ref_fa, called)
        score = tc.score_vcf(truth_vcf, called, ref_fa)
        assert score["snp"]["recall"] >= 0.95, score
        assert score["snp"]["precision"] >= 0.84, score
        assert score["snp"]["f1"] >= 0.90, score
        assert score["gt_concordance"] >= 0.95, score


def test_vcf_min_qual_filter(tmp_path):
    """--min_qual drops low-QUAL variant records but keeps gVCF
    reference rows; default remains emit-everything (reference parity)."""
    from medaka_tpu.io.fastx import FastaWriter

    ls = HaploidLabelScheme()
    draft = "ACGTACGTACGTACGTACGT"
    cons = list(draft)
    cons[5] = "G"    # confident SNP (draft C -> G)
    cons[13] = "T"   # weak SNP (draft C -> T at p=0.55)
    pos = np.zeros(len(draft), dtype=POSITIONS_DTYPE)
    pos["major"] = np.arange(len(draft))
    probs = np.full((len(draft), 5), 0.01, np.float32)
    for i, sym in enumerate(cons):
        p = 0.55 if i == 13 else 0.97
        probs[i, ls.symbols.index(sym)] = p
    s = Sample("ctg", None, None, None, pos, probs,
               np.full(len(draft), 30))
    hdf = str(tmp_path / "probs.hdf")
    with datastore.DataStore(hdf, "w") as ds:
        ds.set_meta(ls, "label_scheme")
        ds.write_sample(s)
    ref_fa = str(tmp_path / "ref.fasta")
    with FastaWriter(ref_fa) as fw:
        fw.write("ctg", draft)

    def records(path):
        return [l for l in open(path) if not l.startswith("#")]

    out_all = str(tmp_path / "all.vcf")
    variant.variants_from_hdf([hdf], ref_fa, out_all)
    assert len(records(out_all)) == 2
    out_filt = str(tmp_path / "filt.vcf")
    variant.variants_from_hdf([hdf], ref_fa, out_filt, min_qual=5.0)
    recs = [r for r in records(out_filt)]
    assert len(recs) == 1 and "\t6\t" in recs[0]
    # gVCF reference rows survive the filter
    out_gvcf = str(tmp_path / "g.vcf")
    variant.variants_from_hdf(
        [hdf], ref_fa, out_gvcf, gvcf=True, min_qual=5.0)
    assert sum(1 for r in records(out_gvcf) if "\t.\t" in r) > 10
