"""Model layer tests: torch-parity of the JAX GRU, checkpoint import/export."""
import io
import pickle
import sys
import tarfile
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medaka_tpu.models import (
    DEFAULT_MODEL_DICT, GRUModel, MajorityVoteModel, load_model,
    model_classes, model_from_dict, save_model)
from medaka_tpu.features import CountsFeatureEncoder
from medaka_tpu.labels import HaploidLabelScheme


def _torch_gru_model(num_features=10, num_classes=5, gru_size=32,
                     n_layers=2, bidirectional=True, seed=0):
    """Build the reference torch architecture directly."""
    import torch

    torch.manual_seed(seed)

    class TorchGRU(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.gru = torch.nn.GRU(
                num_features, gru_size, num_layers=n_layers,
                bidirectional=bidirectional, batch_first=True)
            self.linear = torch.nn.Linear(
                (2 if bidirectional else 1) * gru_size, num_classes)

        def forward(self, x):
            x = self.gru(x)[0]
            x = self.linear(x)
            return torch.softmax(x, dim=-1)

    return TorchGRU()


class TestGRUTorchParity:
    @pytest.mark.parametrize("bidirectional", [True, False])
    def test_logit_parity(self, bidirectional):
        import torch

        tm = _torch_gru_model(gru_size=24, bidirectional=bidirectional)
        model = GRUModel(
            num_features=10, num_classes=5, gru_size=24,
            bidirectional=bidirectional)
        params = model.params_from_torch_state(tm.state_dict())

        rng = np.random.default_rng(7)
        x = rng.random((3, 50, 10), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(model.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_jit_and_shapes(self):
        model = GRUModel(gru_size=16)
        params = model.init_params(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p, x: model.apply(p, x))
        x = jnp.ones((2, 30, 10), jnp.float32)
        out = fn(params, x)
        assert out.shape == (2, 30, 5)
        np.testing.assert_allclose(
            np.asarray(out.sum(-1)), np.ones((2, 30)), atol=1e-5)

    def test_bf16_close(self):
        model = GRUModel(gru_size=16)
        params = model.init_params(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(0).random((2, 40, 10), np.float32))
        full = np.asarray(model.apply(params, x))
        half = np.asarray(
            model.apply(params, x, compute_dtype=jnp.bfloat16))
        # random-init outputs are near-uniform; probabilities must still be
        # close between f32 and bf16 compute
        assert np.max(np.abs(full - half)) < 0.05


class TestMajorityVote:
    def test_apply(self):
        model = MajorityVoteModel()
        x = np.zeros((1, 2, 10), np.float32)
        x[0, 0, 4] = 1.0  # all fwd A
        x[0, 1, 9] = 0.5  # half deletion
        x[0, 1, 3] = 0.5  # half rev T... channel 3 is 't'
        out = np.asarray(model.apply({}, jnp.asarray(x)))
        np.testing.assert_allclose(out[0, 0], [0, 1, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], [0.5, 0, 0, 0, 0.5], atol=1e-6)


class TestRegistry:
    def test_model_from_dict(self):
        model = model_from_dict(DEFAULT_MODEL_DICT)
        assert isinstance(model, GRUModel)
        assert model.gru_size == 256

    def test_registry(self):
        assert "GRUModel" in model_classes
        assert "MajorityVoteModel" in model_classes


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        model = GRUModel(gru_size=8)
        params = model.init_params(jax.random.PRNGKey(1))
        path = str(tmp_path / "model.tar.gz")
        save_model(
            path, model, params,
            feature_encoder=CountsFeatureEncoder(),
            label_scheme=HaploidLabelScheme())
        bundle = load_model(path)
        assert isinstance(bundle.model, GRUModel)
        assert bundle.model.gru_size == 8
        assert isinstance(bundle.feature_encoder, CountsFeatureEncoder)
        assert isinstance(bundle.label_scheme, HaploidLabelScheme)
        x = jnp.ones((1, 20, 10), jnp.float32)
        a = np.asarray(model.apply(params, x))
        b = np.asarray(bundle.model.apply(bundle.params, x))
        np.testing.assert_allclose(a, b, atol=1e-6)


def _fake_medaka_modules():
    """Install fake medaka modules so pickling produces medaka GLOBAL ops."""
    mods = {}
    for name in ("medaka", "medaka.features", "medaka.labels",
                 "medaka.models"):
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        mods[name] = mod

    class CountsFeatureEncoderFake:
        pass

    CountsFeatureEncoderFake.__module__ = "medaka.features"
    CountsFeatureEncoderFake.__qualname__ = "CountsFeatureEncoder"
    CountsFeatureEncoderFake.__name__ = "CountsFeatureEncoder"
    mods["medaka.features"].CountsFeatureEncoder = CountsFeatureEncoderFake

    class HaploidLabelSchemeFake:
        pass

    HaploidLabelSchemeFake.__module__ = "medaka.labels"
    HaploidLabelSchemeFake.__qualname__ = "HaploidLabelScheme"
    HaploidLabelSchemeFake.__name__ = "HaploidLabelScheme"
    mods["medaka.labels"].HaploidLabelScheme = HaploidLabelSchemeFake

    def model_from_dict(d):
        pass

    model_from_dict.__module__ = "medaka.models"
    model_from_dict.__qualname__ = "model_from_dict"
    mods["medaka.models"].model_from_dict = model_from_dict
    return mods


class TestMedakaImport:
    def test_load_reference_format_tarball(self, tmp_path):
        import functools

        import torch

        mods = _fake_medaka_modules()
        try:
            tm = _torch_gru_model(gru_size=12)
            enc = mods["medaka.features"].CountsFeatureEncoder()
            enc.__dict__.update(dict(
                normalise="total", dtypes=("",), tag_name=None,
                tag_value=None, tag_keep_missing=False, read_group=None,
                min_mapq=1, sym_indels=False))
            meta = {
                "model_function": functools.partial(
                    mods["medaka.models"].model_from_dict,
                    {"type": "GRUModel",
                     "kwargs": {"num_features": 10, "num_classes": 5,
                                "gru_size": 12}}),
                "feature_encoder": enc,
                "label_scheme": mods["medaka.labels"].HaploidLabelScheme(),
            }
            meta_bytes = pickle.dumps(meta)
            weights_buf = io.BytesIO()
            torch.save(tm.state_dict(), weights_buf)

            path = str(tmp_path / "medaka_model.tar.gz")
            with tarfile.open(path, "w:gz") as tar:
                info = tarfile.TarInfo("model/weights.pt")
                info.size = len(weights_buf.getvalue())
                tar.addfile(info, io.BytesIO(weights_buf.getvalue()))
                info = tarfile.TarInfo("model/meta.pkl")
                info.size = len(meta_bytes)
                tar.addfile(info, io.BytesIO(meta_bytes))
        finally:
            for name in mods:
                del sys.modules[name]

        bundle = load_model(path)
        assert isinstance(bundle.model, GRUModel)
        assert bundle.model.gru_size == 12
        assert isinstance(bundle.feature_encoder, CountsFeatureEncoder)
        assert bundle.feature_encoder.normalise == "total"
        assert isinstance(bundle.label_scheme, HaploidLabelScheme)

        # imported weights give torch-parity outputs
        x = np.random.default_rng(1).random((2, 25, 10), np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(bundle.model.apply(bundle.params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestExportAndScrape:
    def test_export_round_trip(self, tmp_path):
        """Export to torch weights.pt + config.toml, re-import, logits
        match."""
        import tomllib

        import jax
        import torch

        from medaka_tpu.features import CountsFeatureEncoder
        from medaka_tpu.labels import HaploidLabelScheme
        from medaka_tpu.models import export_model, save_model
        model = GRUModel(gru_size=12)
        params = model.init_params(jax.random.PRNGKey(3))
        src = str(tmp_path / "model.tar.gz")
        save_model(src, model, params,
                   feature_encoder=CountsFeatureEncoder(),
                   label_scheme=HaploidLabelScheme())
        out = export_model(src, str(tmp_path / "exported"))
        import tarfile
        with tarfile.open(out) as tar:
            names = tar.getnames()
            assert "model/config.toml" in names
            assert "model/weights.pt" in names
            config = tomllib.loads(
                tar.extractfile("model/config.toml").read().decode())
            assert config["config_version"] == 3
            assert config["model"]["type"] == "GRUModel"
            tar.extract(
                "model/weights.pt", tmp_path, filter="data")
        state = torch.load(
            str(tmp_path / "model" / "weights.pt"), weights_only=True)
        model2 = GRUModel(gru_size=12)
        params2 = model2.params_from_torch_state(state)
        x = np.random.default_rng(0).random((1, 20, 10)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(model.apply(params, jnp.asarray(x))),
            np.asarray(model2.apply(params2, jnp.asarray(x))),
            rtol=1e-6)

    def test_model_from_basecaller_bam(self):
        from medaka_tpu.models import model_from_basecaller
        bam = "/root/reference/medaka/test/data/bc_model_scrape.bam"
        model = model_from_basecaller(bam)
        assert model == "r1041_e82_400bps_hac_v4.2.0"
        assert model_from_basecaller(bam, variant=True) == \
            "r1041_e82_400bps_hac_variant_v4.2.0"

    def test_model_from_basecaller_fastq(self):
        from medaka_tpu.models import model_from_basecaller
        fq = "/root/reference/medaka/test/data/bc_model_scrape.fastq.gz"
        assert model_from_basecaller(fq) == "r1041_e82_400bps_hac_v4.2.0"
        fq2 = ("/root/reference/medaka/test/data/"
               "bc_model_scrape_minknow.fastq.gz")
        # the minknow-format file carries a sup model
        assert model_from_basecaller(fq2) == "r1041_e82_400bps_sup_v4.2.0"


class TestModelDownload:
    """Download-and-cache with an injectable fetcher (file:// URLs)."""

    def _bundle(self, path):
        import jax

        from medaka_tpu import models
        from medaka_tpu.models.gru import GRUModel
        model = GRUModel(gru_size=8)
        models.save_model(
            str(path), model, model.init_params(jax.random.PRNGKey(0)))
        return str(path)

    def test_download_model_file_url(self, tmp_path):
        from medaka_tpu import models
        src = self._bundle(tmp_path / "src.tar.gz")
        cache = tmp_path / "cache"
        template = "file://" + str(tmp_path / "{fname}")
        import shutil
        shutil.copyfile(
            src, str(tmp_path / "mymodel_model_pt.tar.gz"))
        out = models.download_model(
            "mymodel", cache_dir=str(cache), url_template=template)
        assert out.endswith("mymodel_model_pt.tar.gz")
        bundle = models.load_model(out)
        assert bundle.model.gru_size == 8

    def test_download_validates_garbage(self, tmp_path):
        from medaka_tpu import models
        (tmp_path / "bad_model_pt.tar.gz").write_bytes(b"not a tarball")
        with pytest.raises(Exception):
            models.download_model(
                "bad", cache_dir=str(tmp_path / "cache"),
                url_template="file://" + str(tmp_path / "{fname}"))
        assert not (tmp_path / "cache" / "bad_model_pt.tar.gz").exists()

    def test_resolve_known_model_downloads(self, tmp_path, monkeypatch):
        from medaka_tpu import models, options
        src = self._bundle(tmp_path / "src.tar.gz")
        name = options.current_models[0]
        import shutil
        shutil.copyfile(
            src, str(tmp_path / (name + "_model_pt.tar.gz")))
        monkeypatch.setattr(
            options, "model_url_template",
            "file://" + str(tmp_path / "{fname}"))
        monkeypatch.setattr(
            options, "model_stores",
            (str(tmp_path / "pkg"), str(tmp_path / "home")))
        out = models.resolve_model(name)
        assert (tmp_path / "home" / (name + "_model_pt.tar.gz")).exists()
        assert models.load_model(out).model is not None

    def test_download_error_without_egress(self, tmp_path):
        from medaka_tpu import models
        with pytest.raises(models.DownloadError, match="egress"):
            models.download_model(
                "nonexistent", cache_dir=str(tmp_path),
                url_template="file:///does/not/exist/{fname}")


def test_deprecated_model_refused(monkeypatch):
    """Deprecated model names raise DeprecationError (reference
    options.py:237-244), not a silent resolve."""
    from medaka_tpu import models, options

    monkeypatch.setattr(
        options, "deprecated_models", ["ancient_model"], raising=False)
    with pytest.raises(options.DeprecationError):
        models.resolve_model("ancient_model")


def test_export_refuses_overwrite(tmp_path):
    """export_model honors force (was accepted and ignored)."""
    import jax

    from medaka_tpu import models
    from medaka_tpu.features import CountsFeatureEncoder
    from medaka_tpu.labels import HaploidLabelScheme
    from medaka_tpu.models.gru import GRUModel

    m = GRUModel(num_features=10, num_classes=5, gru_size=8)
    src = str(tmp_path / "m.tar.gz")
    models.save_model(
        src, m, m.init_params(jax.random.PRNGKey(0)),
        feature_encoder=CountsFeatureEncoder(),
        label_scheme=HaploidLabelScheme())
    out = str(tmp_path / "exp")
    models.export_model(src, out)
    with pytest.raises(FileExistsError):
        models.export_model(src, out)
    models.export_model(src, out, force=True)
