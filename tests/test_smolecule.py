"""Smolecule workflow tests, including on reference subread data."""
import numpy as np
import pytest

from medaka_tpu import native, smolecule
from medaka_tpu.common import reverse_complement
from medaka_tpu.features import CountsFeatureEncoder
from medaka_tpu.labels import HaploidLabelScheme
from medaka_tpu.models.majority import MajorityVoteModel

REF_SMOL = "/root/reference/medaka/test/data/smolecule.fasta"


def make_subreads(base, n=6, seed=0, err=0.02):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        read = list(base)
        n_err = rng.poisson(err * len(base))
        for _ in range(n_err):
            p = int(rng.integers(0, len(read)))
            op = rng.integers(0, 3)
            if op == 0:
                read[p] = "ACGT"[rng.integers(0, 4)]
            elif op == 1 and len(read) > 10:
                del read[p]
            else:
                read.insert(p, "ACGT"[rng.integers(0, 4)])
        seq = "".join(read)
        if i % 2:
            seq = reverse_complement(seq)
        out.append(smolecule.Subread("mol_{}".format(i), seq))
    return out


class TestRead:
    def test_orientation(self):
        rng = np.random.default_rng(1)
        base = "".join(
            np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, 500)].tobytes().decode())
        read = smolecule.Read("mol", make_subreads(base))
        read.initialize()
        assert read._orient == [True, False, True, False, True, False]
        orients, subreads = read.interleaved_subreads
        assert len(subreads) == 6
        # interleaving alternates strands for balanced POA
        assert orients[0] != orients[1]

    def test_poa_two_rounds(self):
        rng = np.random.default_rng(2)
        base = "".join(
            np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, 400)].tobytes().decode())
        read = smolecule.Read("mol", make_subreads(base, n=8, seed=3))
        read.poa_consensus()
        first = read.consensus
        read.poa_consensus()
        assert native.edit_distance(read.consensus, base) <= \
            native.edit_distance(first, base) + 2
        assert native.edit_distance(read.consensus, base) <= 6

    def test_multi_from_fastx_reference_data(self):
        reads = list(smolecule.Read.multi_from_fastx(REF_SMOL))
        assert len(reads) == 1
        assert reads[0].nseqs > 2

    def test_depth_filter(self, tmp_path):
        path = str(tmp_path / "sub.fasta")
        with open(path, "w") as fh:
            fh.write(">a_0\nACGTACGTAA\n>a_1\nACGTACGTAA\n"
                     ">b_0\nACGTACGTAA\n")
        reads = list(smolecule.Read.multi_from_fastx(
            path, depth_filter=2))
        assert [r.name for r in reads] == ["a"]


class TestWorkflow:
    def test_end_to_end_reference_data(self, tmp_path):
        out = smolecule.smolecule(
            REF_SMOL, str(tmp_path / "smol"),
            model=MajorityVoteModel(), params={},
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme(),
            threads=2, chunk_len=500, chunk_ovlp=100, batch_size=4)
        from medaka_tpu.io.fastx import read_fastx
        records = list(read_fastx(out))
        assert len(records) >= 1
        # polished consensus close to the POA draft
        poa = {r.name: r.sequence for r in read_fastx(
            str(tmp_path / "smol" / "poa.fasta"))}
        for rec in records:
            base_name = rec.name.split("_")[0]
            assert base_name in poa
            # ends of the POA draft are uncovered by local alignments
            # (fillgaps=False truncates them) and majority-vote differs
            # from POA on noisy real subreads; bound the divergence
            dist = native.edit_distance(rec.sequence, poa[base_name])
            assert len(rec.sequence) > 0.9 * len(poa[base_name])
            assert dist < 0.12 * len(poa[base_name])
