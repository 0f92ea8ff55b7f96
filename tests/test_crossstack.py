"""Cross-stack parity: run REFERENCE medaka code on medaka_tpu outputs.

This is SURVEY.md's M0 harness. The reference package cannot execute its
*feature* pipeline in this environment (htslib/pysam are absent and may
not be installed), but its decode stack — ``medaka.stitch``,
``medaka.variant``, ``medaka.labels`` (including the real compiled C
``variant_columns`` kernel from ``src/medaka_rnn_variants.c``) and its
torch model layer — runs fine under the dependency shims in
``tests/crossstack/refshim``.

The tests here:

1. produce a probability HDF on the reference's own end-to-end dataset
   (``medaka/test/data/workflow``) with the medaka_tpu pipeline,
2. run BOTH stacks' stitch (fasta + fastq) and variant decoding on it,
3. assert byte-identical consensus sequences/qualities and identical
   VCF records,
4. check torch-vs-jax model forward parity using an exported model.

Any divergence in decode, stitch, join, or qual math fails these tests.
"""
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REF_ROOT = pathlib.Path("/root/reference")
WORKFLOW = REF_ROOT / "medaka" / "test" / "data" / "workflow"
DRIVER = pathlib.Path(__file__).parent / "crossstack" / "run_reference.py"

pytestmark = pytest.mark.skipif(
    not WORKFLOW.exists(), reason="reference workflow data not present")


def run_reference(*args):
    """Run the reference-side driver in a subprocess."""
    proc = subprocess.run(
        [sys.executable, str(DRIVER)] + [str(a) for a in args],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        "reference driver failed:\n" + proc.stdout + proc.stderr)
    return proc


def read_fastx_file(path):
    """Parse fasta/fastq into {name: (seq, qual-or-None)}."""
    from medaka_tpu.io.fastx import read_fastx
    out = {}
    for rec in read_fastx(str(path)):
        out[rec.name] = (rec.sequence, rec.quality)
    return out


def read_vcf_records(path):
    """VCF data lines (list of str), header dropped."""
    with open(path) as fh:
        return [
            line.rstrip("\n") for line in fh if not line.startswith("#")]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Probability HDF + both stacks' prerequisites, built once."""
    from medaka_tpu import mapping
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.labels import HaploidLabelScheme
    from medaka_tpu.models.majority import MajorityVoteModel

    base = tmp_path_factory.mktemp("crossstack")
    out = base / "wf"
    # deterministic full pipeline: mapper -> featurizer -> model -> HDF
    mapping.consensus_workflow(
        str(WORKFLOW / "reads.fq.gz"), str(WORKFLOW / "reference.fasta"),
        str(out), model=MajorityVoteModel(), params={},
        feature_encoder=CountsFeatureEncoder(),
        label_scheme=HaploidLabelScheme(),
        threads=4, batch_size=8, chunk_len=2000, chunk_ovlp=200)
    probs = out / "consensus_probs.hdf"
    assert probs.exists()
    ref_probs = out / "ref_probs.hdf"
    run_reference("prep_hdf", probs, ref_probs)
    return out


class TestStitchParity:
    def test_consensus_fasta_identical(self, workdir):
        from medaka_tpu import stitch
        ours = workdir / "ours.fasta"
        theirs = workdir / "theirs.fasta"
        stitch.stitch_to_fasta(
            str(workdir / "consensus_probs.hdf"),
            str(WORKFLOW / "reference.fasta"), str(ours))
        run_reference(
            "stitch", workdir / "ref_probs.hdf",
            WORKFLOW / "reference.fasta", theirs)
        a, b = read_fastx_file(ours), read_fastx_file(theirs)
        assert set(a) == set(b)
        for name in a:
            assert a[name][0] == b[name][0], (
                "consensus sequence diverges for " + name)

    def test_consensus_fastq_qualities_identical(self, workdir):
        from medaka_tpu import stitch
        ours = workdir / "ours.fastq"
        theirs = workdir / "theirs.fastq"
        stitch.stitch_to_fasta(
            str(workdir / "consensus_probs.hdf"),
            str(WORKFLOW / "reference.fasta"), str(ours), qualities=True)
        run_reference(
            "stitch", workdir / "ref_probs.hdf",
            WORKFLOW / "reference.fasta", theirs, "--qualities")
        a, b = read_fastx_file(ours), read_fastx_file(theirs)
        assert set(a) == set(b)
        for name in a:
            assert a[name][0] == b[name][0]
            assert a[name][1] == b[name][1], (
                "per-base qualities diverge for " + name)


class TestVariantParity:
    def test_vcf_records_identical(self, workdir):
        from medaka_tpu import variant
        ours = workdir / "ours.vcf"
        theirs = workdir / "theirs.vcf"
        variant.variants_from_hdf(
            str(workdir / "consensus_probs.hdf"),
            str(WORKFLOW / "reference.fasta"), str(ours))
        run_reference(
            "vcf", workdir / "ref_probs.hdf",
            WORKFLOW / "reference.fasta", theirs)
        ours_recs = read_vcf_records(ours)
        theirs_recs = read_vcf_records(theirs)
        assert len(ours_recs) > 0
        assert ours_recs == theirs_recs

    def test_gvcf_records_identical(self, workdir):
        from medaka_tpu import variant
        ours = workdir / "ours.g.vcf"
        theirs = workdir / "theirs.g.vcf"
        variant.variants_from_hdf(
            str(workdir / "consensus_probs.hdf"),
            str(WORKFLOW / "reference.fasta"), str(ours), gvcf=True)
        run_reference(
            "vcf", workdir / "ref_probs.hdf",
            WORKFLOW / "reference.fasta", theirs, "--gvcf")
        ours_recs = read_vcf_records(ours)
        theirs_recs = read_vcf_records(theirs)
        # gVCF mode emits a record per reference locus
        assert len(ours_recs) > 1000
        assert ours_recs == theirs_recs


class TestModelParity:
    def test_exported_gru_matches_reference_torch(self, workdir, tmp_path):
        """jax forward == reference torch forward with exported weights."""
        import jax

        from medaka_tpu import models
        from medaka_tpu.common import Region
        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.labels import HaploidLabelScheme
        from medaka_tpu.models.gru import GRUModel

        model = GRUModel(num_features=10, num_classes=5, gru_size=64)
        params = model.init_params(jax.random.PRNGKey(1234))
        bundle = tmp_path / "model.tar.gz"
        models.save_model(
            str(bundle), model, params,
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme())
        export = models.export_model(
            str(bundle), output=str(tmp_path / "export"))

        # a real feature batch from the workflow BAM
        enc = CountsFeatureEncoder()
        region = Region("lambda_5kb", 1000, 3000)
        sample = enc.bam_to_sample(
            str(workdir / "calls_to_draft.bam"), region)[0]
        batch = np.ascontiguousarray(
            sample.features[None, ...], dtype=np.float32)
        np.save(tmp_path / "batch.npy", batch)

        ours = np.asarray(model.apply(params, batch))
        run_reference(
            "gru_forward", export, tmp_path / "batch.npy",
            tmp_path / "ref_out.npy")
        theirs = np.load(tmp_path / "ref_out.npy")
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)
