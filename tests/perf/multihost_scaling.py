"""Measured N-process scale-out rows for the BASELINE.md scaling report.

Runs ``medaka_tpu inference --num_processes N --process_id i`` as N real
host processes over a synthetic 2 Mb / 30x BAM on the CPU backend (the
virtual-mesh stand-in for N hosts — no second TPU host exists in this
environment), DataIndex-merges + stitches the per-host HDF5s, checks the
consensus is identical to N=1, and reports aggregate pileup columns/s.

The CPU rows measure the *host pipeline's* scale-out efficiency
(featurization, batching, HDF5, merge); single-chip device throughput is
benchmarked separately by ``bench.py``.

Usage: python tests/perf/multihost_scaling.py [bam] [ref] [out_dir]
"""
import json
import pathlib
import subprocess
import sys
import tempfile
import time

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent.parent


def make_model(path):
    import jax

    from medaka_tpu import models
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.labels import HaploidLabelScheme
    from medaka_tpu.models.gru import GRUModel

    model = GRUModel(num_features=10, num_classes=5, gru_size=16)
    params = model.init_params(jax.random.PRNGKey(7))
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
        "--bam_workers", "2"]
    if region:
        cmd_base += ["--regions", region]
    t0 = time.perf_counter()
    if n_procs == 1:
        subprocess.run(cmd_base, check=True, cwd=str(REPO),
                       capture_output=True)
        files = [out]
    else:
        procs = [
            subprocess.Popen(
                cmd_base + ["--num_processes", str(n_procs),
                            "--process_id", str(pid)],
                cwd=str(REPO), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
            for pid in range(n_procs)]
        for p in procs:
            stdout, _ = p.communicate(timeout=1800)
            assert p.returncode == 0, stdout
        files = [
            out.parent / "{}_host{}.hdf".format(out.stem, pid)
            for pid in range(n_procs)]
    wall = time.perf_counter() - t0
    return files, wall


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
    for n in (1, 2, 4):
        out = out_dir / "n{}.hdf".format(n)
        files, wall = run_shards(bam, model, out, n, region=region)
        cols = n_columns(files)
        fasta = stitch(files, ref, out_dir / "n{}.fasta".format(n))
        if golden is None:
            golden = fasta
        else:
            assert fasta == golden, "consensus diverged at N={}".format(n)
        results[n] = {"wall_s": round(wall, 2), "cols": cols,
                      "cols_per_s": round(cols / wall)}
        print("N={} : {:.1f}s, {} cols, {:.2f} Mcols/s (identical: {})"
              .format(n, wall, cols, cols / wall / 1e6,
                      golden == fasta), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
