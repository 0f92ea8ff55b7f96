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
            assert len(recs) == stats["mapped"]
            # qualities survive and orient with the read
            assert all(r.query_qualities is not None for r in recs[:10])


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
