"""Tests for the inference engine (DataLoader accounting + end-to-end).

Mirrors the reference's ``test_dataloader.py`` batch/sample accounting
strategy and its architecture smoke tests, then drives predict → stitch on
a synthetic genome.
"""
import math
import os

import jax
import numpy as np
import pytest

from medaka_tpu import common, datastore, prediction, stitch
from medaka_tpu.common import Region
from medaka_tpu.features import CountsFeatureEncoder
from medaka_tpu.io.bam import BamRecord, write_bam
from medaka_tpu.labels import HaploidLabelScheme
from medaka_tpu.models.gru import GRUModel


def make_single_read_bam(path, ref_len=5000, seed=11):
    """One read covering [0, ref_len) exactly (reference
    ``test_dataloader.py:18-27`` uses the same construction)."""
    rng = np.random.default_rng(seed)
    seq = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, ref_len)].tobytes().decode()
    rec = BamRecord.build(
        query_name="read1", ref_id=0, pos=0, seq=seq,
        qual=[20] * ref_len, cigar="{}=".format(ref_len), flag=0, mapq=60)
    write_bam(path, [rec], [("ref", ref_len)])
    return path, seq


@pytest.fixture(scope="module")
def single_read_bam(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dl") / "single.bam")
    return make_single_read_bam(path)


class TestDataLoaderAccounting:
    @pytest.mark.parametrize(
        "chunk_len,overlap,batch_size", [
            (1000, 100, 4),
            (999, 10, 7),
            (5000, 0, 2),
        ])
    def test_counts(self, single_read_bam, chunk_len, overlap, batch_size):
        path, _ = single_read_bam
        ref_len = 5000
        loader = prediction.DataLoader(
            path, [Region("ref", 0, ref_len)], CountsFeatureEncoder(),
            batch_size=batch_size, chunk_len=chunk_len,
            chunk_overlap=overlap, bam_workers=2)
        batches = list(loader)
        # sliding-window chunk count over exactly ref_len columns
        if ref_len < chunk_len:
            expected_samples = 1
        else:
            step = chunk_len - overlap
            expected_samples = 1 + math.ceil(
                max(0, ref_len - chunk_len) / step)
        assert loader.n_samples == expected_samples
        assert len(batches) == math.ceil(expected_samples / batch_size)
        for b in batches:
            assert b.features.shape == (batch_size, chunk_len, 10)
            assert np.all(b.lengths[:b.n_valid] > 0)
            assert np.all(b.lengths[b.n_valid:] == 0)

    def test_short_region_quarantine(self, single_read_bam):
        """Regions narrower than chunk_len ride in normal batches."""
        path, _ = single_read_bam
        loader = prediction.DataLoader(
            path, [Region("ref", 0, 300)], CountsFeatureEncoder(),
            batch_size=4, chunk_len=1000, chunk_overlap=100)
        batches = list(loader)
        assert loader.n_samples == 1
        assert len(batches) == 1
        assert batches[0].lengths[0] == 300
        assert loader.remainder_regions == [Region("ref", 0, 300)]

    def test_many_regions(self, single_read_bam):
        """Region spam does not deadlock the bounded queues."""
        path, _ = single_read_bam
        regions = [
            Region("ref", i * 50, i * 50 + 50) for i in range(100)]
        loader = prediction.DataLoader(
            path, regions, CountsFeatureEncoder(),
            batch_size=16, chunk_len=1000, chunk_overlap=100,
            bam_workers=4)
        batches = list(loader)
        assert loader.n_samples == 100
        assert sum(b.n_valid for b in batches) == 100


class TestMaskedScanParity:
    def test_padded_equals_unpadded(self):
        """Masked scan on padded input == unpadded run (the invariant the
        single-static-shape design rests on)."""
        model = GRUModel(gru_size=32)
        params = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = rng.random((2, 50, 10)).astype(np.float32)
        full = model.apply(params, x[:, :37], normalise=True)
        padded_in = np.array(x)
        padded_in[:, 37:] = 0.0
        padded = model.apply(
            params, padded_in, normalise=True,
            lengths=np.array([37, 37], np.int32))
        np.testing.assert_allclose(
            np.asarray(padded)[:, :37], np.asarray(full),
            rtol=1e-5, atol=1e-6)

    def test_mixed_lengths(self):
        model = GRUModel(gru_size=16)
        params = model.init_params(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        T = 40
        lens = [40, 17, 5]
        x = np.zeros((3, T, 10), np.float32)
        singles = []
        for i, n in enumerate(lens):
            xi = rng.random((1, n, 10)).astype(np.float32)
            x[i, :n] = xi[0]
            singles.append(np.asarray(model.apply(params, xi)))
        batched = np.asarray(model.apply(
            params, x, lengths=np.array(lens, np.int32)))
        for i, n in enumerate(lens):
            np.testing.assert_allclose(
                batched[i, :n], singles[i][0], rtol=1e-5, atol=1e-6)


class TestEndToEnd:
    def test_predict_then_stitch(self, tmp_path):
        """BAM of agreeing reads → predict (random model) → HDF → stitch.

        With an untrained model the consensus is noise, but the plumbing
        invariants hold: every column is covered, outputs round-trip, and
        the majority model recovers the reference exactly.
        """
        from medaka_tpu.models.majority import MajorityVoteModel
        ref_len = 3000
        rng = np.random.default_rng(5)
        seq = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, ref_len)].tobytes().decode()
        recs = []
        for i in range(8):
            start = 0
            recs.append(BamRecord.build(
                query_name="r{}".format(i), ref_id=0, pos=start, seq=seq,
                qual=[20] * ref_len, cigar="{}=".format(ref_len),
                flag=0 if i % 2 == 0 else 16, mapq=60))
        bam = str(tmp_path / "reads.bam")
        write_bam(bam, recs, [("ref", ref_len)])
        draft = str(tmp_path / "draft.fasta")
        with open(draft, "w") as fh:
            fh.write(">ref\n{}\n".format(seq))

        out_hdf = str(tmp_path / "probs.hdf5")
        model = MajorityVoteModel()
        n_samples, n_cols = prediction.predict(
            bam, out_hdf, model=model, params={},
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme(),
            chunk_len=1000, chunk_overlap=100, batch_size=4)
        assert n_cols >= ref_len

        fasta = str(tmp_path / "consensus.fasta")
        stitch.stitch_to_fasta(out_hdf, draft, fasta)
        from medaka_tpu.io.fastx import FastaReader
        cons = FastaReader(fasta).fetch("ref")
        assert cons == seq  # perfect pileup + majority vote = reference


class TestTopologyIndependence:
    def test_device_count_invariant_probs(self, tmp_path, single_read_bam):
        """Identical label_probs whether the batch is sharded over 1 or
        8 devices (the multi-host bitwise test the reference lacks,
        SURVEY §4)."""
        import jax

        from medaka_tpu import parallel
        from medaka_tpu.models.gru import GRUModel

        path, _ = single_read_bam
        model = GRUModel(gru_size=16)
        params = model.init_params(jax.random.PRNGKey(0))
        loader = prediction.DataLoader(
            path, [Region("ref", 0, 5000)], CountsFeatureEncoder(),
            batch_size=8, chunk_len=1000, chunk_overlap=100)
        batches = list(loader)
        results = []
        for n_dev in (1, 8):
            mesh = parallel.make_mesh(jax.devices()[:n_dev], data=n_dev)
            pred = prediction.Predictor(
                model, params, mesh=mesh, compute_dtype=None)
            results.append(
                np.concatenate(
                    [pred.predict_on_batch(b) for b in batches]))
        # XLA picks different fusion/reduction orders per topology, so
        # "identical" means within a few float32 ulps, not bitwise
        np.testing.assert_allclose(
            results[0], results[1], rtol=1e-6, atol=1e-7)


class TestCompactTransfer:
    """bf16-in / fp16-log-probs-out transfers match the float path."""

    def test_probs_match_and_preserve_quality(self):
        import jax
        import jax.numpy as jnp

        from medaka_tpu.models.gru import GRUModel

        model = GRUModel(gru_size=32)
        params = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)

        class _B:
            features = rng.random((4, 64, 10)).astype(np.float32)
            lengths = np.array([64, 50, 64, 30], np.int32)
            n_valid = 4

        ref = prediction.Predictor(
            model, params, compute_dtype=jnp.bfloat16,
            compact_transfer=False).predict_on_batch(_B)
        cmp_ = prediction.Predictor(
            model, params, compute_dtype=jnp.bfloat16,
            compact_transfer=True).predict_on_batch(_B)
        assert np.max(np.abs(ref - cmp_)) < 1e-3
        assert np.max(np.abs(cmp_.sum(-1) - 1.0)) < 2e-3
        # fp16 log space must keep QV precision near p=1 (Q40 here);
        # a raw fp16 probability would truncate this to ~Q32
        lp = np.log(np.float32(1 - 1e-4)).astype(np.float16)
        q = -10 * np.log10(1 - np.exp(np.float32(lp)))
        assert abs(q - 40.0) < 0.1


def test_auto_batch_size():
    """Counts models get large batches on accelerators, 128 elsewhere."""
    from medaka_tpu.models.gru import GRUModel
    from medaka_tpu.models.latent_space_lstm import LatentSpaceLSTM

    hbm = 16 << 30  # pin the v5e budget (CPU runs report host RAM)
    assert prediction.auto_batch_size(
        GRUModel(gru_size=256), backend="tpu", hbm_bytes=hbm) == 2560
    assert prediction.auto_batch_size(GRUModel(), backend="cpu") == 128
    assert prediction.auto_batch_size(
        LatentSpaceLSTM(), backend="tpu") == 128
    # wider recurrences / longer chunks scale the batch down
    assert prediction.auto_batch_size(
        GRUModel(gru_size=512), backend="tpu", hbm_bytes=hbm) < 2560
    assert prediction.auto_batch_size(
        GRUModel(gru_size=256), backend="tpu", chunk_len=40000,
        hbm_bytes=hbm) == 640


def test_encoder_overrides(tmp_path, single_read_bam=None):
    """predict() applies read-filter overrides to the loaded encoder."""
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.models.majority import MajorityVoteModel
    from tests.mock_data import create_simple_bam

    bam = create_simple_bam(str(tmp_path / "reads.bam"))
    enc = CountsFeatureEncoder()
    # mapq filter that excludes every mock read -> no samples written
    n_samples, n_cols = prediction.predict(
        bam, str(tmp_path / "probs.hdf5"),
        model=MajorityVoteModel(), params={}, feature_encoder=enc,
        encoder_overrides={"min_mapq": 255})
    assert enc.min_mapq == 255
    assert n_samples == 0
    with pytest.raises(ValueError, match="no filter attribute"):
        prediction.predict(
            bam, str(tmp_path / "probs2.hdf5"),
            model=MajorityVoteModel(), params={}, feature_encoder=enc,
            encoder_overrides={"bogus": 1})


def test_save_features(tmp_path):
    """--save_features keeps the feature matrices in the output HDF5."""
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.models.majority import MajorityVoteModel
    from tests.mock_data import create_simple_bam

    bam = create_simple_bam(str(tmp_path / "reads.bam"))
    out = str(tmp_path / "probs.hdf5")
    prediction.predict(
        bam, out, model=MajorityVoteModel(), params={},
        feature_encoder=CountsFeatureEncoder(), save_features=True)
    import h5py
    with h5py.File(out) as f:
        names = list(f["samples/data"])
        assert names
        grp = f["samples/data"][names[0]]
        assert "features" in grp and "label_probs" in grp


def test_feature_processes_match_threads(tmp_path):
    """Process-pool featurization produces the same batches as threads."""
    path, _ = make_single_read_bam(str(tmp_path / "p.bam"), ref_len=4000)
    regions = [Region("ref", 0, 4000)]

    def collect(**kw):
        loader = prediction.DataLoader(
            path, regions, CountsFeatureEncoder(), batch_size=4,
            chunk_len=1000, chunk_overlap=100, **kw)
        out = []
        for batch in loader:
            for s in batch.samples:
                out.append((s.name, s.features.tobytes()))
        return sorted(out)

    threads = collect(bam_workers=2)
    procs = collect(feature_processes=2)
    assert threads == procs
