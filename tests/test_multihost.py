"""Multi-host scale-out proof (VERDICT round-1 item #4).

The scale-out design replaces the reference's "run independent jobs per
contig and merge HDF5s by hand" advice (``README.md:294-330``) with
deterministic region striding (``parallel.shard_regions``) plus
DataIndex merging. These tests prove it end to end:

- ``medaka_tpu inference --num_processes N --process_id i`` run as N
  REAL subprocesses produces per-host HDF5s whose DataIndex merge
  stitches to a FASTA identical to the single-process run (N = 2, 4).
- ``jax.distributed.initialize`` with a localhost coordinator brings up
  a 2-process cluster and runs a cross-process allgather.
"""
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

from medaka_tpu.io.bam import BamRecord, write_bam
from medaka_tpu.io.fastx import FastaReader, FastaWriter

HERE = pathlib.Path(__file__).parent


def _rand_seq(n, rng):
    return np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, n)].tobytes().decode()


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    """3-contig draft + staggered perfect reads + a tiny model bundle."""
    import jax

    from medaka_tpu import models
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.labels import HaploidLabelScheme
    from medaka_tpu.models.gru import GRUModel

    base = tmp_path_factory.mktemp("multihost")
    rng = np.random.default_rng(17)
    contigs = {
        "ctg{}".format(i): _rand_seq(4000 + 700 * i, rng)
        for i in range(3)}
    draft = base / "draft.fasta"
    with FastaWriter(str(draft)) as fw:
        for name, seq in contigs.items():
            fw.write(name, seq)
    records, lengths = [], []
    for rid, (name, seq) in enumerate(contigs.items()):
        lengths.append((name, len(seq)))
        for j, start in enumerate(range(0, len(seq) - 1500, 700)):
            piece = seq[start:start + 1500]
            records.append(BamRecord.build(
                query_name="{}_r{}".format(name, j), ref_id=rid,
                pos=start, seq=piece, qual=[25] * len(piece),
                cigar="{}=".format(len(piece)), flag=0, mapq=60))
    bam = base / "reads.bam"
    write_bam(str(bam), records, lengths)

    model = GRUModel(num_features=10, num_classes=5, gru_size=8)
    params = model.init_params(jax.random.PRNGKey(7))
    bundle = base / "model.tar.gz"
    models.save_model(
        str(bundle), model, params,
        feature_encoder=CountsFeatureEncoder(),
        label_scheme=HaploidLabelScheme())
    return {"base": base, "draft": draft, "bam": bam, "model": bundle}


def _inference_cmd(genome, output, extra=()):
    return [
        sys.executable, "-m", "medaka_tpu", "inference",
        str(genome["bam"]), str(output), "--model", str(genome["model"]),
        "--cpu", "--chunk_len", "1000", "--chunk_ovlp", "100",
        "--batch_size", "4", "--bam_workers", "1"] + list(extra)


def _run(cmd):
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600,
        cwd=str(HERE.parent))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc


def _stitch(inputs, draft, out):
    from medaka_tpu import stitch
    stitch.stitch_to_fasta([str(p) for p in inputs], str(draft), str(out))
    reader = FastaReader(str(out))
    return {r: reader.fetch(r) for r in reader.references}


class TestMultiProcessInference:
    @pytest.fixture(scope="class")
    def single(self, genome):
        out = genome["base"] / "single.hdf"
        _run(_inference_cmd(genome, out))
        return _stitch(
            [out], genome["draft"], genome["base"] / "single.fasta")

    @pytest.mark.parametrize("n_procs", [2, 4])
    def test_sharded_run_matches_single(self, genome, single, n_procs):
        """N concurrent host processes -> merged FASTA == 1-process."""
        out = genome["base"] / "n{}.hdf".format(n_procs)
        procs = [
            subprocess.Popen(
                _inference_cmd(genome, out, extra=[
                    "--num_processes", str(n_procs),
                    "--process_id", str(pid)]),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=str(HERE.parent))
            for pid in range(n_procs)]
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            assert p.returncode == 0, stdout
        host_files = [
            genome["base"] / "n{}_host{}.hdf".format(n_procs, pid)
            for pid in range(n_procs)]
        for f in host_files:
            assert f.exists(), "missing per-host output {}".format(f)
        merged = _stitch(
            host_files, genome["draft"],
            genome["base"] / "n{}.fasta".format(n_procs))
        assert merged == single


class TestSingleContigDivision:
    """A one-contig genome (the common polishing case) must divide.

    Work is sharded at bam_chunk granularity via ``prediction.plan_work``
    — striding whole contigs would give host 0 everything and hosts
    1..N-1 nothing.
    """

    def test_plan_work_shards_single_contig(self):
        from medaka_tpu import parallel
        from medaka_tpu.common import Region
        from medaka_tpu.prediction import plan_work

        region = [Region("ctg", 0, 5_000_000)]
        work = plan_work(region, bam=None, bam_chunk=1_000_000,
                         chunk_overlap=1000)
        assert len(work) >= 5
        shards = [
            parallel.shard_regions(work, 2, pid) for pid in range(2)]
        assert all(len(s) >= 2 for s in shards)
        assert sorted(
            shards[0] + shards[1],
            key=lambda r: (r.ref_name, r.start)) == sorted(
            work, key=lambda r: (r.ref_name, r.start))

    def test_sharded_single_contig_matches_single(self, genome):
        """2 processes each do part of one contig; merge == 1-process."""
        from medaka_tpu.datastore import DataStore

        # restrict to ctg0 and force sub-contig work units
        extra = ["--regions", "ctg0", "--bam_chunk", "1500"]
        out = genome["base"] / "one_ctg.hdf"
        _run(_inference_cmd(genome, out, extra=extra))
        single = _stitch(
            [out], genome["draft"], genome["base"] / "one_ctg.fasta")

        out2 = genome["base"] / "one_ctg_n2.hdf"
        procs = [
            subprocess.Popen(
                _inference_cmd(genome, out2, extra=extra + [
                    "--num_processes", "2", "--process_id", str(pid)]),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=str(HERE.parent))
            for pid in range(2)]
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            assert p.returncode == 0, stdout
        host_files = [
            genome["base"] / "one_ctg_n2_host{}.hdf".format(pid)
            for pid in range(2)]
        for f in host_files:
            # every host got a non-empty share of the single contig
            with DataStore(str(f)) as ds:
                assert len(ds.sample_registry) > 0, f
        merged = _stitch(
            host_files, genome["draft"],
            genome["base"] / "one_ctg_n2.fasta")
        assert merged == single


class TestDistributedCoordinator:
    def test_localhost_cluster_allgather(self, tmp_path):
        """jax.distributed.initialize + a real cross-process collective."""
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = "127.0.0.1:{}".format(port)
        env = dict(os.environ)
        env["PYTHONPATH"] = str(HERE.parent) + ":" + env.get(
            "PYTHONPATH", "")
        results = [tmp_path / "dist{}.txt".format(pid) for pid in range(2)]
        procs = [
            subprocess.Popen(
                [sys.executable, str(HERE / "multihost_worker.py"),
                 coord, "2", str(pid), str(results[pid])],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=str(HERE.parent), env=env)
            for pid in range(2)]
        for p in procs:
            stdout, _ = p.communicate(timeout=300)
            assert p.returncode == 0, stdout
        for pid, res in enumerate(results):
            # results go through files: gloo banners interleave
            # mid-line with buffered stdout (observed flake).
            out = res.read_text()
            assert "DIST_OK {} [0, 1]".format(pid) in out, out
