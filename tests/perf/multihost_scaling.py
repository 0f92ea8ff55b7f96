"""Measured N-process scale-out rows for the BASELINE.md scaling report.

Runs ``medaka_tpu inference --num_processes N --process_id i`` as N real
host processes over a synthetic BAM on the CPU backend (the stand-in for
N hosts — no second TPU host exists in this environment), DataIndex-
merges + stitches the per-host HDF5s, checks the consensus is identical
to N=1, and reports aggregate pileup columns/s.

Each process is pinned to its own core (``taskset``), so N processes
model N one-core hosts: without pinning, N>1 merely oversubscribes this
machine's 4 cores and measures contention, not scale-out. The rows
measure the *host pipeline's* scale-out efficiency (featurization,
batching, HDF5, merge); single-chip device throughput is benchmarked
separately by ``bench.py``.

Rows are best-of-``SCALING_REPEATS`` (default 3): the host is a VM on
shared hardware and single runs of the same command vary by up to 4x
with hypervisor noise; the minimum over repeats estimates the
contention-free rate each topology can actually sustain.

Usage: python tests/perf/multihost_scaling.py [bam] [ref] [out_dir] [region]
"""
import json
import os
import pathlib
import re
import subprocess
import sys
import tempfile
import time

_SUMMARY = re.compile(
    r"Processed \d+ samples \((\d+) columns\) in ([0-9.]+)s")

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent.parent


def make_model(path):
    import jax

    from medaka_tpu import models
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.labels import HaploidLabelScheme
    
    # MajorityVote: no device compute, so each process's cost is the
    # host pipeline (featurization, batching, HDF5) — the per-host work
    # that scales out in a real multi-host TPU deployment, where model
    # compute is each host's own chip (benched by bench.py).
    from medaka_tpu.models.majority import MajorityVoteModel
    model = MajorityVoteModel()
    params = model.init_params(jax.random.PRNGKey(7)) if hasattr(
        model, "init_params") else {}
    models.save_model(
        str(path), model, params,
        feature_encoder=CountsFeatureEncoder(),
        label_scheme=HaploidLabelScheme())


def n_columns(hdf_files):
    from medaka_tpu.datastore import DataStore
    total = 0
    for f in hdf_files:
        with DataStore(str(f)) as ds:
            for name in ds.sample_registry:
                total += len(ds.load_sample(name).positions)
    return total


def run_shards(bam, model, out, n_procs, bam_chunk=250000,
               region=None):
    cmd_base = [
        sys.executable, "-m", "medaka_tpu", "inference", str(bam),
        str(out), "--model", str(model), "--cpu",
        "--bam_chunk", str(bam_chunk), "--batch_size", "64",
        "--bam_workers", "1"]
    if region:
        cmd_base += ["--regions", region]

    def pinned(cmd, pid):
        core = pid % os.cpu_count()
        return ["taskset", "-c", str(core)] + cmd

    def pipeline_stats(text):
        """Per-process (columns, seconds) from the run summary line.

        Excludes interpreter/jax/model startup, which is a fixed
        ~25-35 s here and amortises away on real genome sizes but
        would otherwise drown the ~15 s of measured work per shard.
        """
        m = _SUMMARY.search(text)
        assert m, "no run summary in process output:\n" + text[-2000:]
        return int(m.group(1)), float(m.group(2))

    t0 = time.perf_counter()
    shard_stats = []
    if n_procs == 1:
        res = subprocess.run(
            pinned(cmd_base, 0), check=True, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        shard_stats.append(pipeline_stats(res.stdout))
        files = [out]
    else:
        procs = [
            subprocess.Popen(
                pinned(cmd_base, pid)
                + ["--num_processes", str(n_procs),
                   "--process_id", str(pid)],
                cwd=str(REPO), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
            for pid in range(n_procs)]
        for p in procs:
            stdout, _ = p.communicate(timeout=1800)
            assert p.returncode == 0, stdout
            shard_stats.append(pipeline_stats(stdout))
        files = [
            out.parent / "{}_host{}.hdf".format(out.stem, pid)
            for pid in range(n_procs)]
    wall = time.perf_counter() - t0
    return files, wall, shard_stats


def stitch(files, ref, out):
    from medaka_tpu import stitch as st
    from medaka_tpu.io.fastx import FastaReader
    st.stitch_to_fasta([str(f) for f in files], str(ref), str(out))
    reader = FastaReader(str(out))
    return {r: reader.fetch(r) for r in reader.references}


def main():
    # the ambient axon sitecustomize overrides JAX_PLATFORMS; pin the
    # orchestrating process to CPU before first device use
    import jax
    jax.config.update("jax_platforms", "cpu")
    bam = sys.argv[1] if len(sys.argv) > 1 else "/tmp/perf/synth.bam"
    ref = sys.argv[2] if len(sys.argv) > 2 else bam + ".ref.fasta"
    out_dir = pathlib.Path(
        sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp())
    out_dir.mkdir(parents=True, exist_ok=True)
    model = out_dir / "model.tar.gz"
    make_model(model)

    results = {}
    golden = None
    region = sys.argv[4] if len(sys.argv) > 4 else None
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    for n in (1, 2, 4):
        best = None
        for rep in range(repeats):
            out = out_dir / "n{}_r{}.hdf".format(n, rep)
            files, wall, shards = run_shards(
                bam, model, out, n, region=region)
            cols = n_columns(files)
            fasta = stitch(
                files, ref, out_dir / "n{}_r{}.fasta".format(n, rep))
            if golden is None:
                golden = fasta
            else:
                assert fasta == golden, \
                    "consensus diverged at N={}".format(n)
            # aggregate pipeline rate: total columns over the slowest
            # shard's in-process time (the makespan once startup paid)
            pipe_cols = sum(c for c, _ in shards)
            pipe_s = max(s for _, s in shards)
            row = {
                "wall_s": round(wall, 2), "cols": cols,
                "cols_per_s": round(cols / wall),
                "pipeline_s": round(pipe_s, 2),
                "pipeline_cols_per_s": round(pipe_cols / pipe_s)}
            if best is None or row["pipeline_cols_per_s"] > \
                    best["pipeline_cols_per_s"]:
                best = row
        results[n] = best
        print("N={} : wall {:.1f}s ({:.2f} Mcols/s) | pipeline {:.1f}s "
              "({:.2f} Mcols/s) best of {}"
              .format(n, best["wall_s"], best["cols"] / best["wall_s"]
                      / 1e6, best["pipeline_s"],
                      best["pipeline_cols_per_s"] / 1e6, repeats),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
