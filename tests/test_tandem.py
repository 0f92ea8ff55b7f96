"""Tandem-repeat genotyping tests on synthetic diploid data."""
import numpy as np
import pytest

from medaka_tpu import tandem
from medaka_tpu.common import Region, reverse_complement
from medaka_tpu.io.bam import BamRecord, write_bam
from medaka_tpu.models import ModelBundle
from medaka_tpu.smolecule import Subread
from medaka_tpu.tandem.clustering import (
    DeNovoClusterer, PrephasedClusterer, SpanningReadClusterFactory)
from medaka_tpu.tandem.record_name import RecordName


def _record(ploidy=2, start=100, end=160):
    return RecordName(
        query_name="tr", ref_name="chr1", ref_start=start, ref_end=end,
        ref_start_padded=start - 10, ref_end_padded=end + 10,
        hap=0, ploidy=ploidy)


def _subread(name_i, seq, hap=0, ps=0, strand="fwd", rec=None):
    rec = rec or _record()
    rn = RecordName(
        query_name="read{}".format(name_i), ref_name=rec.ref_name,
        ref_start=rec.ref_start, ref_end=rec.ref_end,
        ref_start_padded=rec.ref_start_padded,
        ref_end_padded=rec.ref_end_padded, hap=hap, phased_set=ps,
        ploidy=rec.ploidy, strand=strand)
    return Subread(str(rn), seq)


class TestRecordName:
    def test_round_trip(self):
        rec = _record()
        parsed = RecordName.from_str(str(rec))
        assert parsed.ref_start == 100
        assert parsed.ref_end_padded == 170
        assert parsed.ploidy == 2
        assert parsed.to_unpadded_region() == Region("chr1", 100, 160)

    def test_reference_format_compatible(self):
        """Names produced by the reference implementation parse."""
        name = ("readA_chr20_100_200_pad_90_210_rev_hap2_"
                "phased-set7_ploidy2")
        rn = RecordName.from_str(name)
        assert (rn.hap, rn.phased_set, rn.strand) == (2, 7, "rev")


class TestClusterers:
    def _diploid_reads(self, n_per_hap=6, seed=0):
        rng = np.random.default_rng(seed)
        flank = "".join(rng.choice(list("ACGT"), 30))
        allele1 = flank + "CAG" * 10 + flank
        allele2 = flank + "CAG" * 20 + flank
        reads = []
        for i in range(n_per_hap):
            reads.append(_subread(i, allele1, hap=1, ps=5))
            reads.append(_subread(
                i + n_per_hap, allele2, hap=2, ps=5,
                strand="rev" if i % 2 else "fwd"))
        # orient rev reads' stored seq as the fwd would appear after RC
        fixed = []
        for s in reads:
            rn = RecordName.from_str(s.name)
            seq = s.seq if rn.strand == "fwd" else \
                reverse_complement(s.seq)
            fixed.append(Subread(s.name, seq))
        return fixed, allele1, allele2

    def test_prephased(self):
        reads, *_ = self._diploid_reads()
        clusterer = PrephasedClusterer()
        d, clustered = clusterer.cluster_spanningreads(_record(), reads)
        haps = {rec.hap: len(v) for rec, v in clustered.items()}
        assert haps[1] == 6 and haps[2] == 6 and haps[0] == 0
        assert d["phasing_method"] == "prephased"

    def test_denovo_heterozygous(self):
        reads, *_ = self._diploid_reads()
        # strip HP tags (hap=0) to force de-novo clustering
        stripped = []
        for s in reads:
            rn = RecordName.from_str(s.name)
            keep_hap = rn.hap  # remember ground truth via name
            rn.hap = 0
            rn.query_name += "_truth{}".format(keep_hap)
            stripped.append(Subread(str(rn), s.seq))
        d, clustered = DeNovoClusterer().cluster_spanningreads(
            _record(), stripped)
        assert d["phasing_method"] == "abpoa"
        assert not d["is_homozygous"]
        # clusters must separate the two alleles perfectly
        by_hap = {rec.hap: v for rec, v in clustered.items()}
        for h in (1, 2):
            truths = {
                RecordName.from_str(s.name).query_name.split("_truth")[1]
                for s in by_hap[h]}
            assert len(truths) == 1

    def test_denovo_homozygous(self):
        rng = np.random.default_rng(3)
        flank = "".join(rng.choice(list("ACGT"), 30))
        allele = flank + "CAG" * 12 + flank
        reads = [_subread(i, allele) for i in range(8)]
        d, clustered = DeNovoClusterer().cluster_spanningreads(
            _record(), reads)
        assert d["is_homozygous"]
        by_hap = {rec.hap: v for rec, v in clustered.items()}
        assert len(by_hap[1]) == 8

    def test_factory(self):
        for method in SpanningReadClusterFactory.clustering_techniques:
            c = SpanningReadClusterFactory.create_clusterer(
                method, min_depth=3)
            assert c is not None
        with pytest.raises(ValueError):
            SpanningReadClusterFactory.create_clusterer("nope")


class TestEndToEnd:
    def test_diploid_str_genotyping(self, tmp_path):
        """Synthetic diploid STR: the TR VCF reports both alleles."""
        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.labels import HaploidLabelScheme
        from medaka_tpu.models.majority import MajorityVoteModel

        rng = np.random.default_rng(11)
        left = "".join(rng.choice(list("ACGT"), 400))
        right = "".join(rng.choice(list("ACGT"), 400))
        repeat_ref = "CAG" * 10
        ref_seq = left + repeat_ref + right
        tr_start, tr_end = 400, 400 + len(repeat_ref)
        ref_fa = str(tmp_path / "ref.fasta")
        with open(ref_fa, "w") as fh:
            fh.write(">chr1\n{}\n".format(ref_seq))

        # diploid sample: hap1 = reference allele, hap2 = 20 repeats
        allele1 = ref_seq
        allele2 = left + "CAG" * 20 + right
        recs = []
        i = 0
        for hap, allele in ((1, allele1), (2, allele2)):
            extra = len(allele) - len(ref_seq)
            cigar = "{}=".format(len(ref_seq)) if extra == 0 else \
                "{}={}I{}=".format(tr_end, extra, len(right))
            for _ in range(8):
                recs.append(BamRecord.build(
                    query_name="r{}".format(i), ref_id=0, pos=0,
                    seq=allele, qual=[20] * len(allele), cigar=cigar,
                    flag=0, mapq=60, tags=dict(HP=hap, PS=1)))
                i += 1
        bam = str(tmp_path / "reads.bam")
        write_bam(bam, recs, [("chr1", len(ref_seq))])

        bundle = ModelBundle(
            MajorityVoteModel(), {},
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme())
        out = tandem.main(
            bam, ref_fa, [Region("chr1", tr_start, tr_end)],
            str(tmp_path / "tr"), model_bundle=bundle,
            phasing="prephased", min_depth=3, workers=2)
        assert out is not None
        from medaka_tpu.vcf import VCFReader
        variants = list(VCFReader(out, cache=False).fetch())
        assert len(variants) == 1
        v = variants[0]
        assert v.pos == tr_start
        # hap2 carries 10 extra CAG copies
        assert v.genotype_data["GT"] in ("0|1", "1|0", "0/1", "1/0")
        alts = v.alt if isinstance(v.alt, list) else [v.alt]
        assert any(len(a) - len(v.ref) == 30 for a in alts)
