"""CLI surface tests: parser tree and end-to-end subcommand runs."""
import numpy as np
import pytest

from medaka_tpu import cli


def run_cli(argv):
    return cli.main(argv)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """A BAM + draft + saved model for CLI runs."""
    import jax

    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.io.bam import BamRecord, write_bam
    from medaka_tpu.labels import HaploidLabelScheme
    from medaka_tpu.models import save_model
    from medaka_tpu.models.gru import GRUModel

    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(1)
    seq = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, 1200)].tobytes().decode()
    recs = [
        BamRecord.build(
            query_name="r{}".format(i), ref_id=0, pos=0, seq=seq,
            qual=[20] * 1200, cigar="1200=", flag=0, mapq=60,
            tags=dict(MD="1200"))
        for i in range(4)]
    bam = str(d / "reads.bam")
    write_bam(bam, recs, [("ref", 1200)])
    draft = str(d / "draft.fasta")
    with open(draft, "w") as fh:
        fh.write(">ref\n{}\n".format(seq))
    truth = str(d / "truth.bam")
    write_bam(
        truth,
        [BamRecord.build(
            query_name="truth", ref_id=0, pos=0, seq=seq,
            qual=[20] * 1200, cigar="1200=", flag=0, mapq=60,
            tags=dict(MD="1200"))],
        [("ref", 1200)])
    model = GRUModel(gru_size=8)
    model_path = str(d / "model.tar.gz")
    save_model(
        model_path, model, model.init_params(jax.random.PRNGKey(0)),
        feature_encoder=CountsFeatureEncoder(),
        label_scheme=HaploidLabelScheme())
    return {"dir": d, "bam": bam, "draft": draft, "model": model_path,
            "truth": truth, "seq": seq}


def test_version(capsys):
    with pytest.raises(SystemExit) as e:
        run_cli(["--version"])
    assert e.value.code == 0


def test_console_entries(capsys):
    """`medaka_tpu_data_path` / `_version_report` console scripts.

    Reference console scripts `medaka_data_path` and
    `medaka_version_report` (`setup.py:136-141`).
    """
    from medaka_tpu import cli, options
    assert cli.data_path() == 0
    assert capsys.readouterr().out.strip() == options.model_stores[0]
    assert cli.version_report() == 0
    out = capsys.readouterr().out
    assert "medaka_tpu" in out and "native library: ok" in out


def test_store_dict_parsing():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--kv", nargs="+", action=cli.StoreDict, default={})
    ns = p.parse_args(
        ["--kv", "a=1", "b=2.5", "c=hello", "d=true", "e=none"])
    assert ns.kv == {"a": 1, "b": 2.5, "c": "hello", "d": True, "e": None}


def test_inference_sequence_vcf_roundtrip(workspace, tmp_path):
    probs = str(tmp_path / "probs.hdf")
    assert run_cli([
        "inference", workspace["bam"], probs,
        "--model", workspace["model"],
        "--chunk_len", "400", "--chunk_ovlp", "100",
        "--batch_size", "4", "--quiet",
        "--save_features", "--check_output"]) == 0
    import h5py
    with h5py.File(probs) as fh:
        grp = fh["samples/data"][list(fh["samples/data"])[0]]
        assert "features" in grp
    cons = str(tmp_path / "cons.fasta")
    assert run_cli([
        "sequence", probs, workspace["draft"], cons, "--quiet"]) == 0
    from medaka_tpu.io.fastx import FastaReader
    assert len(FastaReader(cons).fetch("ref")) > 0
    vcf = str(tmp_path / "out.vcf")
    assert run_cli([
        "vcf", probs, workspace["draft"], vcf, "--quiet"]) == 0
    assert open(vcf).read().startswith("##fileformat")
    bed = str(tmp_path / "out.bed")
    assert run_cli(["tools", "hdf_to_bed", probs, bed]) == 0
    assert open(bed).read().startswith("ref\t0\t1200")
    snp_vcf = str(tmp_path / "snp.vcf")
    assert run_cli([
        "snp", probs, workspace["draft"], snp_vcf, "--quiet"]) == 0
    assert open(snp_vcf).read().startswith("##fileformat")


def test_features_and_train(workspace, tmp_path):
    feats = str(tmp_path / "train_feats.hdf")
    # self-truth: align the draft-identical reads as "truth"
    assert run_cli([
        "features", workspace["bam"], feats,
        "--truth", workspace["truth"],
        "--chunk_len", "200", "--chunk_ovlp", "50", "--quiet"]) == 0
    from medaka_tpu.datastore import DataIndex
    di = DataIndex([feats])
    assert len(di.samples) > 0
    out = str(tmp_path / "trained")
    assert run_cli([
        "train", feats, "--train_name", out, "--epochs", "1",
        "--batch_size", "4", "--optimizer", "adam", "--quiet"]) == 0
    import glob
    import os
    assert glob.glob(os.path.join(out, "model-0.tar.gz"))


def test_resolve_model_missing():
    with pytest.raises(FileNotFoundError):
        run_cli(["tools", "resolve_model", "--model", "no_such_model"])


def test_small_tools(workspace, tmp_path, monkeypatch):
    """vcf2fasta, prepare_tagged_bam, model-introspection tools."""
    import numpy as np

    from medaka_tpu.io.bam import BamReader
    from medaka_tpu.io.fastx import FastaReader
    from medaka_tpu.vcf import Variant, VCFWriter

    # vcf2fasta
    vcf = str(tmp_path / "in.vcf")
    seq = workspace["seq"]
    alt_base = "A" if seq[10] != "A" else "C"
    with VCFWriter(vcf, contigs=["ref,length={}".format(len(seq))]) as w:
        w.write_variant(Variant(
            "ref", 10, seq[10], [alt_base],
            genotype_data={"GT": "1"}))
    out_fa = str(tmp_path / "out.fasta")
    assert run_cli([
        "tools", "vcf2fasta", vcf, workspace["draft"], out_fa]) == 0
    new_seq = FastaReader(out_fa).fetch("ref")
    assert new_seq[10] == alt_base
    assert new_seq[:10] == seq[:10]

    # prepare_tagged_bam
    tagged = str(tmp_path / "tagged.bam")
    assert run_cli([
        "tools", "prepare_tagged_bam", workspace["bam"],
        workspace["truth"], "--values", "1", "2", "--tag", "HP",
        "--output", tagged]) == 0
    with BamReader(tagged) as br:
        haps = {rec.tags.get("HP")
                for rec in br.fetch("ref", 0, br.lengths[0])}
        assert haps == {1, 2}

    # model introspection
    assert run_cli(["tools", "is_rle_model", workspace["model"]]) == 0
    assert run_cli([
        "tools", "get_alignment_params", workspace["model"]]) == 0
    assert run_cli([
        "tools", "get_model_dtypes", workspace["model"]]) == 0
    # real downloads now: fails cleanly (rc 1) without network egress
    assert run_cli([
        "tools", "download_models", "--models", "somemodel"]) == 1

    # pileup_counts bench tool
    assert run_cli([
        "tools", "pileup_counts", workspace["bam"], "ref:0-1200"]) == 0


def test_consensus_from_features(workspace, tmp_path):
    """features -> consensus_from_features -> probs file."""
    feats = str(tmp_path / "feats.hdf")
    assert run_cli([
        "features", workspace["bam"], feats,
        "--truth", workspace["truth"],
        "--chunk_len", "200", "--chunk_ovlp", "50", "--quiet"]) == 0
    probs = str(tmp_path / "probs.hdf")
    assert run_cli([
        "consensus_from_features", feats, probs,
        "--model", workspace["model"], "--batch_size", "4",
        "--quiet"]) == 0
    from medaka_tpu.datastore import DataStore
    with DataStore(probs) as ds:
        assert ds.n_samples > 0
        name = sorted(ds.sample_registry)[0]
        assert ds.load_sample(name).label_probs is not None
    # default batch size path (auto-sized from the first sample's
    # chunk length; regression: raised UnboundLocalError)
    probs2 = str(tmp_path / "probs_auto.hdf")
    assert run_cli([
        "consensus_from_features", feats, probs2,
        "--model", workspace["model"], "--quiet"]) == 0
    with DataStore(probs2) as ds:
        assert ds.n_samples > 0


def test_variant_pipeline(workspace, tmp_path):
    """Full medaka_variant-equivalent pipeline on synthetic reads."""
    import gzip

    import numpy as np

    from medaka_tpu.common import reverse_complement
    seq = workspace["seq"]
    # reads carrying a SNP at position 600
    alt = "A" if seq[600] != "A" else "C"
    varseq = seq[:600] + alt + seq[601:]
    reads = str(tmp_path / "reads.fastq")
    with open(reads, "w") as fh:
        for i in range(8):
            s = varseq if True else seq
            if i % 2:
                s = reverse_complement(s)
            fh.write("@vr{}\n{}\n+\n{}\n".format(i, s, "I" * len(s)))
    out = str(tmp_path / "vp")
    assert run_cli([
        "variant", reads, workspace["draft"], "-o", out,
        "-m", workspace["model"], "-t", "2",
        "--chunk_len", "400", "--chunk_ovlp", "100", "-b", "4",
        "--quiet"]) == 0
    import os
    assert os.path.exists(os.path.join(out, "medaka.annotated.vcf"))
    # with a random model the calls are noise; the pipeline contract is
    # that the annotated VCF exists and parses
    from medaka_tpu.vcf import VCFReader
    list(VCFReader(os.path.join(out, "medaka.annotated.vcf"),
                   cache=False).fetch())


def test_consensus_joint(workspace, tmp_path):
    """Dual-datatype joint polishing with a dtype-splitting model."""
    import jax
    import numpy as np

    from medaka_tpu.common import reverse_complement
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.io.fastx import FastaReader
    from medaka_tpu.labels import HaploidLabelScheme
    from medaka_tpu.models import save_model
    from medaka_tpu.models.gru import GRUModel

    seq = workspace["seq"]
    # two read sets (slightly different error processes not needed;
    # identical reads suffice to exercise the plumbing)
    files = []
    for tag in ("r9", "r10"):
        path = str(tmp_path / "{}.fastq".format(tag))
        with open(path, "w") as fh:
            for i in range(4):
                s = seq if i % 2 == 0 else reverse_complement(seq)
                fh.write("@{}_{}\n{}\n+\n{}\n".format(
                    tag, i, s, "I" * len(s)))
        files.append(path)
    # a model whose encoder splits by those datatypes (20 features)
    model = GRUModel(num_features=20, gru_size=8)
    model_path = str(tmp_path / "joint_model.tar.gz")
    save_model(
        model_path, model, model.init_params(jax.random.PRNGKey(0)),
        feature_encoder=CountsFeatureEncoder(dtypes=("r9", "r10")),
        label_scheme=HaploidLabelScheme())
    out_dir = str(tmp_path / "joint")
    assert run_cli([
        "consensus_joint", "-i", files[0], "-v", "r9",
        "-i", files[1], "-v", "r10", "-d", workspace["draft"],
        "-o", out_dir, "-m", model_path, "-t", "2",
        "--chunk_len", "400", "--chunk_ovlp", "100", "-b", "4",
        "--quiet"]) == 0
    import os
    cons = FastaReader(
        os.path.join(out_dir, "consensus.fasta")).fetch("ref")
    assert len(cons) > 0.9 * len(seq)


def test_python_dash_m_entrypoint():
    """`python -m medaka_tpu` must work (the __main__ shim)."""
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "medaka_tpu", "--version"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0
    assert "medaka_tpu" in out.stdout + out.stderr
