"""Tests for label schemes (parity: reference test_labels.py golden cases)."""
import numpy as np
import pytest

from medaka_tpu.common import Region, Sample, make_positions
from medaka_tpu.features import CountsFeatureEncoder
from medaka_tpu.labels import (
    DiploidLabelScheme, HaploidLabelScheme, RLELabelScheme, TruthAlignment,
    find_variant_columns, from_dict, label_schemes)

from mock_data import create_simple_bam, create_truth_bam

# Golden from the reference mock scenario (test_counts.py:90-116)
EXPECTED_LABELS = [1, 2, 1, 4, 1, 3, 1, 4, 3]
EXPECTED_POSITIONS = [
    (0, 0), (1, 0), (2, 0), (3, 0), (3, 1), (4, 0), (5, 0), (6, 0), (7, 0)]


@pytest.fixture(scope="module")
def bams(tmp_path_factory):
    d = tmp_path_factory.mktemp("bams")
    reads = str(d / "reads.bam")
    truth = str(d / "truth.bam")
    create_simple_bam(reads)
    create_truth_bam(truth)
    return reads, truth


class TestEncoding:
    def test_haploid_encoding(self):
        scheme = HaploidLabelScheme()
        assert scheme.num_classes == 5
        assert scheme.padding_vector == 0
        assert scheme._encoding[("A",)] == 1
        assert scheme._encoding[("T",)] == 4

    def test_diploid_encoding(self):
        scheme = DiploidLabelScheme()
        assert scheme.num_classes == 15
        # combinations_with_replacement of '*ACGT'
        assert scheme._encoding[("*", "*")] == 0
        assert scheme._encoding[("A", "A")] == 5
        enc = scheme._labels_to_encoded_labels([("C", "A")])
        assert enc[0] == scheme._encoding[("A", "C")]

    def test_rle_encoding(self):
        scheme = RLELabelScheme(max_run=12)
        assert scheme.num_classes == 1 + 4 * 12
        assert scheme._encoding[(("*", 1),)] == 0
        assert scheme._encoding[(("A", 1),)] == 1
        assert scheme._encoding[(("T", 12),)] == 48

    def test_registry_and_from_dict(self):
        for name in ("HaploidLabelScheme", "DiploidLabelScheme",
                     "RLELabelScheme"):
            assert name in label_schemes
        scheme = from_dict({"type": "RLELabelScheme",
                            "kwargs": {"max_run": 7}})
        assert scheme.max_run == 7

    def test_truth_to_labels(self, bams):
        reads, truth = bams
        scheme = HaploidLabelScheme()
        alns = TruthAlignment.bam_to_alignments(
            truth, Region("ref", 0, 100), min_length=0)
        assert len(alns) == 1
        positions, encoded = scheme.encode(alns[0])
        # truth ACATAGATCTG, 4=1I3=2I1=
        assert list(map(tuple, positions)) == [
            (0, 0), (1, 0), (2, 0), (3, 0), (3, 1), (4, 0), (5, 0), (6, 0),
            (6, 1), (6, 2), (7, 0)]
        assert list(encoded) == [1, 2, 1, 4, 1, 3, 1, 4, 2, 4, 3]

    def test_training_samples_golden(self, bams):
        # The full parity check of reference test_counts.py:73-116
        reads, truth = bams
        encoder = CountsFeatureEncoder(normalise="total")
        scheme = HaploidLabelScheme()
        result = encoder.bams_to_training_samples(
            truth, reads, Region("ref", 0, 100), scheme, min_length=0)[0]
        assert list(map(tuple, result.positions)) == EXPECTED_POSITIONS
        np.testing.assert_array_equal(result.labels, EXPECTED_LABELS)


class TestVariantColumns:
    def test_basic(self):
        minor = np.array([0, 0, 1, 1, 0, 0])
        ref = np.array(list("AC**GT"))
        pred = np.array(list("ACA*GT"))
        out = find_variant_columns(minor, ref, pred)
        # insertion column differs -> inserts of that major marked,
        # but the major itself is only variant if IT differs
        assert list(out) == [False, False, True, True, False, False]

    def test_major_substitution_marks_inserts(self):
        minor = np.array([0, 1, 0])
        ref = np.array(list("A*T"))
        pred = np.array(list("C*T"))
        out = find_variant_columns(minor, ref, pred)
        assert list(out) == [True, True, False]

    def test_requires_leading_major(self):
        with pytest.raises(ValueError):
            find_variant_columns(np.array([1, 0]), np.array(list("AA")),
                                 np.array(list("AA")))


def _probs_from_seq(seq, scheme, p=0.9):
    """Synthesize confident label_probs yielding the given symbols."""
    probs = np.full((len(seq), len(scheme.symbols)),
                    (1 - p) / (len(scheme.symbols) - 1), dtype=np.float32)
    for i, s in enumerate(seq):
        probs[i, scheme.symbols.index(s)] = p
    return probs


class TestHaploidDecoding:
    def setup_method(self):
        self.scheme = HaploidLabelScheme()

    def _sample(self, symbols, majors, minors):
        pos = make_positions(majors, minors)
        probs = _probs_from_seq(symbols, self.scheme)
        return Sample("chr1", None, None, None, pos, probs)

    def test_decode_consensus(self):
        s = self._sample("AC*GT", range(5), [0] * 5)
        assert self.scheme.decode_consensus(s) == "ACGT"
        seq, quals = self.scheme.decode_consensus(s, with_qualities=True)
        assert seq == "ACGT"
        assert len(quals) == 4
        # p=0.9 (float32) -> q9.9999 truncated -> chr(42) == '*'
        assert quals == "****"

    def test_decode_consensus_with_gaps(self):
        s = self._sample("AC*GT", range(5), [0] * 5)
        assert self.scheme.decode_consensus(s, with_gaps=True) == "AC*GT"

    def test_decode_variants_substitution(self):
        ref_seq = "AACGT"
        # consensus differs at position 2: C->T
        s = self._sample("AATGT", range(5), [0] * 5)
        variants = self.scheme.decode_variants(s, ref_seq)
        assert len(variants) == 1
        v = variants[0]
        assert v.pos == 2
        assert v.ref == "C"
        assert v.alt == ["T"]
        assert v.genotype_data["GT"] == "1"

    def test_decode_variants_insertion(self):
        ref_seq = "AACGT"
        s = self._sample(
            "AACTGT", [0, 1, 2, 2, 3, 4], [0, 0, 0, 1, 0, 0])
        variants = self.scheme.decode_variants(s, ref_seq)
        assert len(variants) == 1
        v = variants[0]
        # insertion of T after C at pos 2, normalised
        assert v.pos == 2
        assert v.ref == "C"
        assert v.alt == ["CT"]

    def test_decode_variants_deletion(self):
        ref_seq = "AACGT"
        s = self._sample("AA*GT", range(5), [0] * 5)
        variants = self.scheme.decode_variants(s, ref_seq)
        assert len(variants) == 1
        v = variants[0]
        assert v.pos == 1
        assert v.ref == "AC"
        assert v.alt == ["A"]

    def test_decode_variants_return_all(self):
        ref_seq = "AACGT"
        s = self._sample("AACGT", range(5), [0] * 5)
        variants = self.scheme.decode_variants(
            s, ref_seq, return_all=True)
        assert len(variants) == 5
        assert all(v.alt == ["."] for v in variants)

    def test_decode_snps(self):
        ref_seq = "AACGT"
        probs = _probs_from_seq("AATGT", self.scheme, p=0.96)
        s = Sample("chr1", None, None, None,
                   make_positions(range(5), [0] * 5), probs)
        snps = self.scheme.decode_snps(s, ref_seq)
        assert len(snps) == 1
        assert snps[0].pos == 2
        assert snps[0].alt == ["T"]
        assert snps[0].genotype_data["GT"] == "1/1"

    def test_decode_snps_heterozygous(self):
        ref_seq = "AACGT"
        probs = _probs_from_seq("AACGT", self.scheme, p=0.96)
        # secondary call T at pos 2 with prob 0.45
        probs[2] = [0.01, 0.02, 0.50, 0.02, 0.45]
        s = Sample("chr1", None, None, None,
                   make_positions(range(5), [0] * 5), probs)
        snps = self.scheme.decode_snps(s, ref_seq, threshold=0.04)
        assert len(snps) == 1
        assert snps[0].alt == ["T"]
        assert snps[0].genotype_data["GT"] == "0/1"


class TestDiploidDecoding:
    def test_decode_snps(self):
        scheme = DiploidLabelScheme()
        probs = np.zeros((3, scheme.num_classes), dtype=np.float32)
        probs[0, scheme._encoding[("A", "A")]] = 1.0  # hom ref
        probs[1, scheme._encoding[("A", "C")]] = 1.0  # het
        probs[2, scheme._encoding[("T", "T")]] = 1.0  # hom alt
        s = Sample("chr1", None, None, None,
                   make_positions(range(3), [0] * 3), probs)
        snps = scheme.decode_snps(s, "AAC")
        assert len(snps) == 2
        assert snps[0].pos == 1
        assert snps[0].alt == ["C"]
        assert snps[0].genotype_data["GT"] == "0/1"
        assert snps[1].pos == 2
        assert snps[1].alt == ["T"]
        assert snps[1].genotype_data["GT"] == "1/1"


class TestRLEDecoding:
    def test_decode_consensus(self):
        scheme = RLELabelScheme(max_run=3)
        probs = np.zeros((4, scheme.num_classes), dtype=np.float32)
        probs[0, scheme._encoding[(("A", 2),)]] = 1.0
        probs[1, scheme._encoding[(("*", 1),)]] = 1.0
        probs[2, scheme._encoding[(("C", 1),)]] = 1.0
        probs[3, scheme._encoding[(("G", 3),)]] = 1.0
        s = Sample("chr1", None, None, None,
                   make_positions(range(4), [0] * 4), probs)
        assert scheme.decode_consensus(s) == "AACGGG"

    def test_decode_consensus_with_qualities(self):
        """RLE decode is stitchable: per-base quals expand with runs.

        (The reference's stitch crashes on RLE models — its RLE
        ``decode_consensus`` rejects ``with_qualities``,
        ``stitch.py:63`` vs ``labels.py:1301``.)
        """
        scheme = RLELabelScheme(max_run=3)
        probs = np.zeros((2, scheme.num_classes), dtype=np.float32)
        probs[0, scheme._encoding[(("A", 2),)]] = 1.0   # q capped
        probs[1, scheme._encoding[(("T", 3),)]] = 0.9   # q10
        probs[1, scheme._encoding[(("*", 1),)]] = 0.1
        s = Sample("chr1", None, None, None,
                   make_positions(range(2), [0] * 2), probs)
        seq, qual = scheme.decode_consensus(s, with_qualities=True)
        assert seq == "AATTT"
        assert len(qual) == len(seq)
        assert qual[0] == qual[1] and qual[2] == qual[3] == qual[4]
        # phred of 1-0.9 (float32 rounding may truncate 10.0 to 9)
        assert ord(qual[2]) - 33 in (9, 10)


class TestDiploidProbToSnp:
    """Per-case diploid genotype decoding (reference
    ``test_labels.py:548-588``)."""

    def _call(self, pair, ref_symbol, return_all=False):
        scheme = DiploidLabelScheme()
        key = tuple(sorted(pair, key="*ACGT".index))
        probs = np.zeros((1, scheme.num_classes), dtype=np.float32)
        probs[0, scheme._encoding[key]] = 1.0
        s = Sample("chr1", None, None, None,
                   make_positions([10], [0]), probs)
        scheme.ref_seq = "N" * 10 + ref_symbol
        scheme.secondary_threshold = 0.04
        scheme.ref_vcf = None
        return scheme._prob_to_snp(
            probs, np.array([10]), "chr1", [ref_symbol],
            return_all=return_all)

    def test_homozygous_ref_gvcf(self):
        [v] = self._call(("C", "C"), "C", return_all=True)
        assert (v.alt, v.genotype_data["GT"]) == (["."], "0/0")

    def test_homozygous_ref_skipped(self):
        assert self._call(("C", "C"), "C") == []

    def test_homozygous_alt(self):
        [v] = self._call(("A", "A"), "C")
        assert (v.ref, v.alt, v.genotype_data["GT"]) == ("C", ["A"], "1/1")

    def test_heterozygous_double(self):
        [v] = self._call(("A", "T"), "C")
        assert (v.alt, v.genotype_data["GT"]) == (["A", "T"], "1/2")

    def test_heterozygous_single(self):
        [v] = self._call(("C", "T"), "C")
        assert (v.alt, v.genotype_data["GT"]) == (["T"], "0/1")

    def test_homozygous_deletion_ignored(self):
        assert self._call(("*", "*"), "C") == []

    def test_het_ref_deletion_ignored(self):
        assert self._call(("C", "*"), "C") == []

    def test_het_alt_deletion_becomes_hom_alt(self):
        [v] = self._call(("T", "*"), "C")
        assert (v.alt, v.genotype_data["GT"]) == (["T"], "1/1")


class TestDiploidDecodeSnpsGolden:
    def test_pair_label_table(self):
        """Mirror of the reference's diploid decode_snps golden
        (``test_labels.py:590-629``): two haplotype strings over a
        gapped reference decode to an exact variant table."""
        ref = "CATGCGTCGATGCAT*G"
        hp1 = "gAgGTGatacT*CATCG".upper()
        hp2 = "Cca***T*c**a**c**".upper()

        scheme = DiploidLabelScheme()
        majors, minors = [], []
        major = -1
        for r in ref:
            if r == "*":
                minors.append(minors[-1] + 1 if ref else 1)
            else:
                major += 1
                minors.append(0)
            majors.append(major)
        probs = np.zeros(
            (len(ref), scheme.num_classes), dtype=np.float32)
        for i, (a, b) in enumerate(zip(hp1, hp2)):
            key = tuple(sorted((a, b), key="*ACGT".index))
            probs[i, scheme._encoding[key]] = 1.0
        s = Sample("chr1", None, None, None,
                   make_positions(majors, minors), probs)
        variants = sorted(
            scheme.decode_snps(s, ref.replace("*", "")),
            key=lambda v: v.pos)
        expected = [
            (0, "C", ["G"], "0/1"),
            (1, "A", ["C"], "0/1"),
            (2, "T", ["A", "G"], "1/2"),
            (4, "C", ["T"], "1/1"),
            (6, "T", ["A"], "0/1"),
            (7, "C", ["T"], "1/1"),
            (8, "G", ["A", "C"], "1/2"),
            (9, "A", ["C"], "1/1"),
            (11, "G", ["A"], "1/1"),
            (14, "T", ["C"], "0/1"),
        ]
        got = [
            (v.pos, v.ref, v.alt, v.genotype_data["GT"])
            for v in variants]
        assert got == expected


class TestRLEGolden:
    """RLE scheme goldens (reference ``test_labels.py:635-705``)."""

    def test_encoding_table(self):
        scheme = RLELabelScheme(max_run=3)
        expected = {
            (("*", 1),): 0, (("A", 1),): 1, (("A", 2),): 2,
            (("A", 3),): 3, (("C", 1),): 4, (("C", 2),): 5,
            (("C", 3),): 6, (("G", 1),): 7, (("G", 2),): 8,
            (("G", 3),): 9, (("T", 1),): 10, (("T", 2),): 11,
            (("T", 3),): 12}
        assert dict(scheme._encoding) == expected
        assert scheme.num_classes == 13
        assert scheme.padding_vector == 0

    def test_alignment_to_pairs_caps_runs(self):
        """Insertions, deletions and a run above max_run (capped)."""
        from medaka_tpu.io.bam import BamRecord
        scheme = RLELabelScheme(max_run=3)
        aln = BamRecord.build(
            query_name="query", ref_id=1, pos=10,
            seq="ACATGATGTAC", cigar="3=1I2=1D5=", flag=0, mapq=60,
            qual=[2, 1, 4, 5, 1, 1, 2, 16, 2, 3, 4])
        expected = (
            (10, ("A", 2)), (11, ("C", 1)), (12, ("A", 3)),
            (None, ("T", 3)), (13, ("G", 1)), (14, ("A", 1)),
            (15, ("*", 1)), (16, ("T", 2)), (17, ("G", 3)),
            (18, ("T", 2)), (19, ("A", 3)), (20, ("C", 3)))
        assert tuple(scheme._alignment_to_pairs(aln)) == expected

    def test_decode_consensus_expansion_golden(self):
        scheme = RLELabelScheme(max_run=3)
        probs = np.zeros((6, 13), dtype=np.float32)
        for i, cls in enumerate((10, 5, 0, 3, 8, 5)):
            probs[i, cls] = 0.9
        s = Sample("chr1", None, None, None,
                   make_positions(range(6), [0] * 6), probs)
        assert scheme.decode_consensus(s) == "TCCAAAGGCC"

    def test_max_run_boundary_rounds(self):
        """Runs exactly at and above max_run clip to max_run."""
        scheme = RLELabelScheme(max_run=3)
        from medaka_tpu.io.bam import BamRecord
        aln = BamRecord.build(
            query_name="q", ref_id=0, pos=0, seq="AC",
            cigar="2=", flag=0, mapq=60, qual=[3, 200 - 33])
        pairs = tuple(scheme._alignment_to_pairs(aln))
        assert pairs[0][1] == ("A", 3)
        assert pairs[1][1] == ("C", 3)


class _FakeAln:
    """Minimal stand-in for a BamRecord in TruthAlignment tests."""

    def __init__(self, start, end, ref_id=0):
        self.reference_start = start
        self.reference_end = end
        self.reference_length = end - start
        self.ref_id = ref_id

    def get_reference_sequence(self):
        return "A" * self.reference_length

    @property
    def query_sequence(self):
        return "A" * self.reference_length


class TestTruthAlignmentOverlapRules:
    """The four-case overlap policy of reference ``labels.py:53-136``:
    comparable-length overlapping segments split the disputed window,
    an engulfed short segment is dropped (both dropped if the long one
    is comparable), and a much longer segment wins outright."""

    def _filter(self, alns, **kw):
        from medaka_tpu.labels import TruthAlignment
        region = Region("r", 0, 100_000)
        return TruthAlignment._filter_alignments(
            [TruthAlignment(a) for a in alns], region,
            min_length=1000, **kw)

    def test_disjoint_kept_sorted(self):
        out = self._filter([_FakeAln(5000, 8000), _FakeAln(0, 4000)])
        assert [(a.start, a.end) for a in out] == [
            (0, 4000), (5000, 8000)]

    def test_comparable_overlap_splits_window(self):
        # comparable lengths, modest overlap: boundary moves so the
        # segments abut at each other's former ends
        out = self._filter([_FakeAln(0, 6000), _FakeAln(5000, 11000)])
        assert [(a.start, a.end) for a in out] == [
            (0, 5000), (6000, 11000)]

    def test_engulfed_short_dropped_long_wins(self):
        # the long segment is >= 2x the short one: short is dropped,
        # long keeps the whole window
        out = self._filter([_FakeAln(0, 20000), _FakeAln(1000, 4000)])
        assert [(a.start, a.end) for a in out] == [(0, 20000)]

    def test_engulfed_comparable_both_dropped(self):
        # mostly-engulfed and comparable length: irreconcilable, both go
        out = self._filter([_FakeAln(0, 6000), _FakeAln(2000, 8000)])
        assert out == []

    def test_min_length_after_trim(self):
        # a segment trimmed below min_length by the split is dropped:
        # disputed 600 / small 1500 = 0.4 < 0.5 so the window splits —
        # left [0, 5400], right [6000, 6900] -> 900 < min_length
        out = self._filter(
            [_FakeAln(0, 6000), _FakeAln(5400, 6900)],
            length_ratio=10.0)
        assert [(a.start, a.end) for a in out] == [(0, 5400)]

    def test_insert_only_zero_reflen_dropped(self):
        out = self._filter([_FakeAln(0, 0), _FakeAln(0, 3000)])
        assert [(a.start, a.end) for a in out] == [(0, 3000)]


class TestTruthAlignmentHaplotypeGrouping:
    """Reference ``labels.py:170-234``: per anchor-haplotype segment,
    pick each other haplotype's best-overlapping segment and trim every
    member to the window intersection; anchors with no partner are
    skipped."""

    def _group(self, by_hap):
        from medaka_tpu.labels import TruthAlignment
        wrapped = {
            h: [TruthAlignment(a) for a in alns]
            for h, alns in by_hap.items()}
        return TruthAlignment._group_and_trim_by_haplotype(wrapped)

    def test_single_haplotype_passthrough(self):
        groups = self._group({None: [_FakeAln(0, 5000)]})
        assert len(groups) == 1 and len(groups[0]) == 1

    def test_two_haplotypes_trim_to_intersection(self):
        groups = self._group({
            1: [_FakeAln(0, 6000)],
            2: [_FakeAln(1000, 7000)]})
        assert len(groups) == 1
        (a, b), = groups
        assert (a.start, a.end) == (1000, 6000)
        assert (b.start, b.end) == (1000, 6000)

    def test_best_overlap_partner_chosen(self):
        groups = self._group({
            1: [_FakeAln(0, 6000)],
            2: [_FakeAln(0, 1500), _FakeAln(1400, 6200)]})
        (a, b), = groups
        # the second hap-2 segment covers more of the anchor window
        assert (a.start, a.end) == (1400, 6000)
        assert b.aln.reference_start == 1400

    def test_anchor_without_partner_skipped(self):
        groups = self._group({
            1: [_FakeAln(0, 3000), _FakeAln(10000, 13000)],
            2: [_FakeAln(0, 2900)]})
        assert len(groups) == 1
        assert groups[0][0].start == 0


class TestDiploidHetRescue:
    """Opt-in decode improvement over the reference's pure-argmax
    diploid genotyping: a hom-ref argmax with >= threshold probability
    on the best (ref, X) het class is called het. Measured on the
    round-5 diploid campaign: SNP F1 0.929 -> 0.967 at threshold 0.1
    (PARITY.md)."""

    def _outputs(self, scheme, ref="A", hom_ref=0.7, het=0.25, alt="C"):
        out = np.zeros((1, scheme.num_classes), np.float32)
        out[0, scheme._encoding[(ref, ref)]] = hom_ref
        out[0, scheme._encoding[tuple(sorted((ref, alt)))]] = het
        out[0] /= out[0].sum()
        return out

    def test_default_is_reference_parity_argmax(self):
        scheme = DiploidLabelScheme()
        res = scheme._prob_to_snp(
            self._outputs(scheme), np.array([7]), "ctg", "A")
        assert res == []

    def test_rescue_calls_het_above_threshold(self):
        scheme = DiploidLabelScheme()
        scheme.het_rescue = 0.1
        res = scheme._prob_to_snp(
            self._outputs(scheme), np.array([7]), "ctg", "A")
        assert len(res) == 1
        v = res[0]
        assert v.pos == 7 and v.ref == "A" and v.alt == ["C"]
        assert v.genotype_data["GT"] == "0/1"

    def test_rescue_respects_threshold(self):
        scheme = DiploidLabelScheme()
        scheme.het_rescue = 0.4
        res = scheme._prob_to_snp(
            self._outputs(scheme, het=0.25), np.array([7]), "ctg", "A")
        assert res == []

    def test_rescue_never_touches_real_calls(self):
        # a genuine het argmax is decoded identically with rescue on
        scheme = DiploidLabelScheme()
        out = self._outputs(scheme, hom_ref=0.2, het=0.7)
        plain = scheme._prob_to_snp(out, np.array([3]), "ctg", "A")
        scheme.het_rescue = 0.1
        rescued = scheme._prob_to_snp(out, np.array([3]), "ctg", "A")
        assert [str(v) for v in rescued] == [str(v) for v in plain]
