"""Native read mapper and full consensus workflow tests."""
import numpy as np
import pytest

from medaka_tpu import mapping, native
from medaka_tpu.common import reverse_complement

WORKFLOW = "/root/reference/medaka/test/data/workflow"


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, n)].tobytes().decode()


class TestMapper:
    @pytest.fixture(scope="class")
    def ref_and_mapper(self):
        ref = rand_seq(50000, 0)
        return ref, native.Mapper([("c1", ref)])

    def test_exact_placement(self, ref_and_mapper):
        ref, m = ref_and_mapper
        read = list(ref[10000:15000])
        read[100] = "A" if read[100] != "A" else "C"
        del read[2000]
        read = "".join(read)
        hit = m.map(read)
        assert (hit.ref_start, hit.flag) == (10000, 0)
        assert hit.cigar == "100=1X1899=1D2999="

    def test_reverse_strand(self, ref_and_mapper):
        ref, m = ref_and_mapper
        read = ref[20000:24000]
        hit = m.map(reverse_complement(read))
        assert (hit.ref_start, hit.flag) == (20000, 16)

    def test_garbage_unmapped(self, ref_and_mapper):
        _, m = ref_and_mapper
        assert m.map(rand_seq(3000, 99)) is None

    def test_multi_contig(self):
        refs = [("a", rand_seq(20000, 1)), ("b", rand_seq(20000, 2))]
        m = native.Mapper(refs)
        hit = m.map(refs[1][1][5000:9000])
        assert (hit.ref_id, hit.ref_start) == (1, 5000)
        m.close()


class TestAlignReads:
    def test_real_workflow_reads(self, tmp_path):
        """Map the reference's real nanopore workflow reads."""
        out_bam = str(tmp_path / "calls.bam")
        stats = mapping.align_reads(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            out_bam, threads=4)
        # ~46% of that read set does not align to lambda at all
        # (verified by direct SW); everything alignable maps
        assert stats["mapped"] > 1400
        from medaka_tpu.io.bam import BamReader
        with BamReader(out_bam) as br:
            recs = list(br.fetch("lambda_5kb", 0, 4970))
            primaries = [r for r in recs if not r.flag & 2048]
            assert len(primaries) == stats["mapped"]
            # qualities survive and orient with the read
            assert all(r.query_qualities is not None for r in recs[:10])
            # mapq is a real confidence model, not a constant: values
            # live in [0, 60] and the unique lambda placements dominate
            mapqs = [r.mapq for r in primaries]
            assert all(0 <= q <= 60 for q in mapqs)
            high = sum(1 for q in mapqs if q >= 50)
            assert high / len(mapqs) > 0.9
            assert len(set(mapqs)) > 1


    def test_md_tags_reconstruct_reference(self, tmp_path):
        """align_reads(md=True) MD tags must reconstruct the aligned
        reference exactly (the contract labels.TruthAlignment relies
        on via BamRecord.get_reference_sequence)."""
        import numpy as np

        from medaka_tpu.io.bam import BamReader
        from medaka_tpu.io.fastx import FastaReader, FastaWriter

        rng = np.random.default_rng(0)
        ref = "".join(rng.choice(list("ACGT"), 2000))
        ref_fa = str(tmp_path / "ref.fasta")
        with FastaWriter(ref_fa) as fw:
            fw.write("r", ref)
        # queries with subs, an insertion, a deletion, and one reverse
        reads_fa = str(tmp_path / "reads.fasta")
        q1 = list(ref[100:1100])
        q1[50] = "A" if q1[50] != "A" else "C"
        q1[500] = "G" if q1[500] != "G" else "T"
        q2 = ref[200:700] + "TT" + ref[700:1300]        # insertion
        q3 = ref[300:900] + ref[905:1500]               # deletion
        q4 = mapping.common.reverse_complement(ref[400:1400])
        with FastaWriter(reads_fa) as fw:
            for i, q in enumerate(["".join(q1), q2, q3, q4]):
                fw.write("q{}".format(i), q)
        out_bam = str(tmp_path / "md.bam")
        mapping.align_reads(reads_fa, ref_fa, out_bam, md=True)
        with BamReader(out_bam) as br:
            recs = [r for r in br.fetch("r") if not r.flag & 2048]
        assert len(recs) == 4
        for rec in recs:
            got = rec.get_reference_sequence()
            want = ref[rec.reference_start:rec.reference_end]
            assert got == want, rec.query_name


class TestConsensusWorkflow:
    def test_full_pipeline_real_data(self, tmp_path):
        """reads + draft -> polished consensus, fully standalone."""
        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.io.fastx import FastaReader
        from medaka_tpu.labels import HaploidLabelScheme
        from medaka_tpu.models.majority import MajorityVoteModel
        out = mapping.consensus_workflow(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            str(tmp_path / "wf"),
            model=MajorityVoteModel(), params={},
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme(),
            threads=4, batch_size=8, chunk_len=2000, chunk_ovlp=200)
        cons = FastaReader(out).fetch("lambda_5kb")
        draft = FastaReader(
            WORKFLOW + "/reference.fasta").fetch("lambda_5kb")
        dist = native.edit_distance(cons, draft)
        # majority vote of ~200x real reads stays within a handful of
        # edits of the (high-quality) draft
        assert dist < 20


class TestWorkflowGolden:
    def test_majority_consensus_regression(self, tmp_path):
        """Deterministic end-to-end snapshot on the real workflow data.

        The majority-vote model has no weights, so the whole pipeline
        (mapper -> featurizer -> decode -> stitch) is deterministic;
        any change to this hash means a behavioural change somewhere in
        the stack and must be intentional.
        """
        import hashlib
        import json

        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.io.fastx import FastaReader
        from medaka_tpu.labels import HaploidLabelScheme
        from medaka_tpu.models.majority import MajorityVoteModel
        out = mapping.consensus_workflow(
            WORKFLOW + "/reads.fq.gz", WORKFLOW + "/reference.fasta",
            str(tmp_path / "wf"),
            model=MajorityVoteModel(), params={},
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme(),
            threads=4, batch_size=8, chunk_len=2000, chunk_ovlp=200)
        cons = FastaReader(out).fetch("lambda_5kb")
        with open("tests/goldens/workflow_majority.json") as fh:
            golden = json.load(fh)
        assert len(cons) == golden["consensus_len"]
        assert hashlib.sha256(
            cons.encode()).hexdigest() == golden["consensus_sha256"]


class TestMapqModel:
    """MAPQ + supplementary mappings (reference src/medaka_bamiter.c:16-46
    keys its read filters on minimap2 mapq; ours must be meaningful)."""

    @pytest.fixture(scope="class")
    def repetitive(self):
        """Draft with two identical 2 kb copies."""
        a, b = rand_seq(4000, 11), rand_seq(4000, 12)
        dup = a[1000:3000]
        ref = a[:1000] + dup + b[:500] + dup + b[500:]
        return ref, dup, native.Mapper([("rep", ref)])

    def test_unique_read_high_mapq(self, repetitive):
        ref, _dup, m = repetitive
        hits = m.map_all(ref[100:900])
        assert len(hits) == 1 and hits[0].mapq >= 50

    def test_repeat_read_zero_mapq(self, repetitive):
        _ref, dup, m = repetitive
        hits = m.map_all(dup[200:1800])
        assert len(hits) == 1
        assert hits[0].mapq < 5

    def test_min_mapq_excludes_repeat_reads_from_counts(
            self, repetitive, tmp_path):
        """Repetitive-region reads are invisible to the default encoder."""
        from medaka_tpu.common import Region
        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.io.bam import BamRecord, write_bam
        from medaka_tpu.io.fastx import FastaWriter

        ref, dup, m = repetitive
        records = []
        for i in range(5):
            read = dup[100 + 7 * i:1900]
            hit = m.map_all(read)[0]
            cigar = hit.cigar
            if hit.query_start:
                cigar = "{}S".format(hit.query_start) + cigar
            if len(read) != hit.query_end:
                cigar += "{}S".format(len(read) - hit.query_end)
            records.append(BamRecord.build(
                query_name="rep{}".format(i), ref_id=hit.ref_id,
                pos=hit.ref_start, seq=read, qual=[20] * len(read),
                cigar=cigar, flag=hit.flag, mapq=hit.mapq))
        bam = str(tmp_path / "rep.bam")
        write_bam(bam, records, [("rep", len(ref))])
        region = Region("rep", records[0].pos,
                        records[0].pos + 500)
        strict = CountsFeatureEncoder(min_mapq=1)
        for s in strict.bam_to_sample(bam, region):
            assert s.features is None  # mapq-0 reads filtered out
        lenient = CountsFeatureEncoder(min_mapq=0)
        samples = lenient.bam_to_sample(bam, region)
        assert samples and samples[0].depth.max() >= 4

    def test_chimeric_read_supplementary(self):
        a, b = rand_seq(4000, 21), rand_seq(4000, 22)
        m = native.Mapper([("a", a), ("b", b)])
        chimera = a[0:1500] + reverse_complement(b[2000:3500])
        hits = m.map_all(chimera)
        assert len(hits) == 2
        primary = [h for h in hits if not h.is_supplementary]
        supp = [h for h in hits if h.is_supplementary]
        assert len(primary) == 1 and len(supp) == 1
        placements = {
            (h.ref_id, h.flag & 16, h.ref_start) for h in hits}
        assert (0, 0, 0) in placements       # fwd half on contig a
        assert (1, 16, 2000) in placements   # rev half on contig b
        # both placements are unambiguous
        assert all(h.mapq >= 50 for h in hits)
        # each covers roughly half of the (oriented) query, disjointly
        for h in hits:
            assert (h.query_end - h.query_start) == pytest.approx(
                1500, abs=60)

    def test_min_score_never_orphans_supplementaries(self, tmp_path):
        """min_score gates on the primary, not per-hit.

        A chimeric read whose primary fails min_score must vanish
        entirely — a lone flag-2048 record is SAM-invalid and silently
        disappears from pileups (read filters drop supplementaries).
        """
        from medaka_tpu.io.bam import BamReader
        from medaka_tpu.io.fastx import FastaWriter, FastqWriter

        a, b = rand_seq(4000, 31), rand_seq(4000, 32)
        draft = str(tmp_path / "draft.fasta")
        with FastaWriter(draft) as fw:
            fw.write("a", a)
            fw.write("b", b)
        # short primary (low score) + long supplementary
        chimera = a[0:400] + reverse_complement(b[1000:3800])
        reads = str(tmp_path / "reads.fastq")
        with FastqWriter(reads) as fw:
            fw.write("chimera", chimera, "5" * len(chimera))
        out = str(tmp_path / "calls.bam")
        # threshold between the two chain scores: primary is the
        # longer segment, so gate above the short segment's score
        stats = mapping.align_reads(
            reads, draft, out, min_score=1000)
        with BamReader(out) as br:
            recs = list(br)
        supp = [r for r in recs if r.flag & 2048]
        prim = [r for r in recs if not (r.flag & 2048)]
        # whatever passed, no supplementary exists without a primary
        assert not supp or prim, recs
        assert stats["mapped"] == len(set(r.query_name for r in prim))


class TestUnmappedReadsAreUnalignable:
    def test_unmapped_reads_fail_direct_sw(self, tmp_path):
        """The ~46% unmapped fraction is real, not mapper misses.

        A sample of reads the mapper rejects is aligned directly with
        Smith-Waterman against the full draft (both strands); their
        best identity must be far below what any true lambda read
        achieves, while a sample of mapped reads scores high.
        """
        from medaka_tpu.io.fastx import FastaReader, read_fastx

        draft = FastaReader(
            WORKFLOW + "/reference.fasta").fetch("lambda_5kb")
        m = native.Mapper([("lambda_5kb", draft)])

        def sw_identity(seq):
            best = 0
            for s in (seq, reverse_complement(seq)):
                aln = native.align(s, draft, mode="sw")
                # matches=2, mismatch=-4 scoring: score/2 bounds matches
                best = max(best, aln.score / 2.0 / max(1, len(s)))
            return best

        mapped_ids, unmapped_ids = [], []
        reads = {}
        for rec in read_fastx(WORKFLOW + "/reads.fq.gz"):
            if len(mapped_ids) >= 15 and len(unmapped_ids) >= 15:
                break
            if not (200 < len(rec.sequence) < 3000):
                continue
            hit = m.map(rec.sequence)
            reads[rec.name] = rec.sequence
            (mapped_ids if hit else unmapped_ids).append(rec.name)
        assert len(unmapped_ids) >= 15  # the unmappable fraction exists

        unmapped_scores = [
            sw_identity(reads[n]) for n in unmapped_ids[:15]]
        mapped_scores = [sw_identity(reads[n]) for n in mapped_ids[:15]]
        # measured separation: mapped reads' score/len is >= 0.41 on
        # this data; unmapped reads have essentially no alignment at
        # all (<= 0.04) — they are foreign sequence, not mapper misses
        assert min(mapped_scores) > 0.3, mapped_scores
        assert max(unmapped_scores) < 0.1, unmapped_scores
