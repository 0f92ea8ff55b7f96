"""Model registry, serialisation and checkpoint import.

Parity target: ``medaka/models.py`` (registry/resolve/open: models.py:39-298).
Model files are ``.tar.gz`` archives holding ``config.json`` (architecture +
feature encoder + label scheme configs) and ``weights.npz``; reference medaka
``.tar.gz`` checkpoints (``weights.pt`` + pickled meta) can be imported
directly (no medaka/torch-runtime needed beyond torch's pickle reader).
"""
from __future__ import annotations

import io
import json
import os
import tarfile
import tempfile
from typing import Dict, Optional

import numpy as np

from medaka_tpu import common

model_classes = {}


def register_model(cls):
    """Class decorator adding a model to the registry."""
    model_classes[cls.__name__] = cls
    return cls


def model_from_dict(d: Dict):
    """Instantiate a model from a {type, kwargs} dict."""
    cls = model_classes[d["type"]]
    return cls(**d.get("kwargs", {}))


DEFAULT_MODEL_DICT = {
    "type": "GRUModel",
    "kwargs": {"num_features": 10, "num_classes": 5, "gru_size": 256},
}


class ModelBundle:
    """A model plus its params and data-processing configs."""

    def __init__(self, model, params, feature_encoder=None,
                 label_scheme=None):
        """Bundle the four components of a usable checkpoint."""
        self.model = model
        self.params = params
        self.feature_encoder = feature_encoder
        self.label_scheme = label_scheme

    def get_meta(self, key):
        """Access meta components by reference-compatible names."""
        if key == "feature_encoder":
            return self.feature_encoder
        if key == "label_scheme":
            return self.label_scheme
        if key == "model_function":
            return self.model.to_dict()
        raise KeyError(key)


def save_model(path: str, model, params, feature_encoder=None,
               label_scheme=None, extra_meta: Optional[Dict] = None) -> str:
    """Write a model bundle as tar.gz(config.json + weights.npz)."""
    import jax

    config = {
        "format_version": 1,
        "model": model.to_dict(),
        "feature_encoder":
            feature_encoder.to_dict() if feature_encoder else None,
        "label_scheme": label_scheme.to_dict() if label_scheme else None,
    }
    if extra_meta:
        config["extra"] = extra_meta
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        flat[key] = np.asarray(leaf)
    buf_npz = io.BytesIO()
    np.savez(buf_npz, **flat)

    with tarfile.open(path, "w:gz") as tar:
        data = json.dumps(config, indent=2).encode()
        info = tarfile.TarInfo("model/config.json")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
        npz_bytes = buf_npz.getvalue()
        info = tarfile.TarInfo("model/weights.npz")
        info.size = len(npz_bytes)
        tar.addfile(info, io.BytesIO(npz_bytes))
    return path


def _unflatten(flat: Dict[str, np.ndarray]):
    """Rebuild the nested params pytree from 'a/b/0/c' style keys."""
    root: Dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _safe_extract_names(tar):
    for member in tar.getmembers():
        if member.name.startswith("/") or ".." in member.name:
            raise ValueError("Unsafe path in model archive: " + member.name)
        yield member


def load_model(path: str) -> ModelBundle:
    """Load a model bundle; accepts our format or reference medaka tgz."""
    with open(path, "rb") as fh:
        head = fh.read(40)
    if head.startswith(b"version https://git-lfs"):
        raise ValueError(
            "{} is a git-lfs pointer stub, not the model itself; "
            "fetch the real file with `git lfs pull` (or download the "
            "model tarball) first.".format(path))
    with tarfile.open(path, "r:*") as tar:
        names = [m.name for m in _safe_extract_names(tar)]
        if any(n.endswith("config.json") for n in names):
            return _load_native(tar, names)
    # reference medaka format (separate open: torch reads from file paths)
    from medaka_tpu.compat import load_medaka_tgz
    return load_medaka_tgz(path)


def _load_native(tar, names) -> ModelBundle:
    import medaka_tpu.features as features_mod
    import medaka_tpu.labels as labels_mod

    config_name = next(n for n in names if n.endswith("config.json"))
    npz_name = next(n for n in names if n.endswith("weights.npz"))
    config = json.loads(tar.extractfile(config_name).read().decode())
    with np.load(io.BytesIO(tar.extractfile(npz_name).read())) as npz:
        flat = {k: npz[k] for k in npz.files}
    params = _unflatten(flat)
    model = model_from_dict(config["model"])
    fenc = (features_mod.from_dict(config["feature_encoder"])
            if config.get("feature_encoder") else None)
    lsch = (labels_mod.from_dict(config["label_scheme"])
            if config.get("label_scheme") else None)
    return ModelBundle(model, params, fenc, lsch)


def open_model(path: str) -> ModelBundle:
    """Alias of :func:`load_model` (reference API name)."""
    return load_model(path)


def _default_fetcher(url: str) -> bytes:
    """Fetch a URL's bytes (supports http(s):// and file://)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.read()


def download_model(name: str, fetcher=None, cache_dir: Optional[str] = None,
                   url_template: Optional[str] = None) -> str:
    """Download-and-cache a named model (reference ``models.py:39-139``).

    The tarball is fetched (default: urllib over the reference's GitHub
    URL template, which also accepts ``file://`` URLs), validated by
    loading it, then moved into the cache. ``fetcher`` is injectable so
    deployments can route through mirrors/artifact stores — and so the
    path is testable without egress.

    :param name: model name, e.g. ``r1041_e82_400bps_sup_v5.0.0``.
    :param fetcher: callable url -> bytes (default urllib).
    :param cache_dir: target directory (default the user model store).
    :returns: path of the cached model file.
    """
    import tempfile

    from medaka_tpu import options

    logger = common.get_named_logger("ModelFetch")
    if fetcher is None:
        fetcher = _default_fetcher
    if cache_dir is None:
        cache_dir = options.model_stores[-1]
    template = url_template or options.model_url_template
    fname = name + "_model_pt.tar.gz"
    url = template.format(fname=fname)
    logger.info("Fetching %s", url)
    try:
        blob = fetcher(url)
    except Exception as e:
        raise DownloadError(
            "Could not fetch model {!r} from {} ({}). This environment "
            "may lack network egress; place the file under {} "
            "manually.".format(name, url, e, cache_dir)) from e
    os.makedirs(cache_dir, exist_ok=True)
    tmp = tempfile.NamedTemporaryFile(
        dir=cache_dir, suffix=".part", delete=False)
    try:
        tmp.write(blob)
        tmp.close()
        load_model(tmp.name)  # validation: must be a loadable bundle
        target = os.path.join(cache_dir, fname)
        os.replace(tmp.name, target)
    except Exception:
        os.unlink(tmp.name)
        raise
    logger.info("Cached %s", target)
    return target


class DownloadError(RuntimeError):
    """Raised when a model cannot be fetched or validated."""


def resolve_model(model: str, fetcher=None) -> str:
    """Resolve a model name or path to a loadable file path.

    Search order mirrors the reference (``models.py:39-139``): explicit
    path, package data dir, user cache, then download-and-cache for
    known model names (requires egress, or an injected ``fetcher``).
    """
    from medaka_tpu import options

    if os.path.exists(model):
        return model
    if model in getattr(options, "deprecated_models", ()):
        # reference medaka refuses these outright (options.py:237-244)
        raise options.DeprecationError(
            "Model {!r} is deprecated and no longer supported; see "
            "`tools list_models` for current models.".format(model))
    data_dir = os.path.join(os.path.dirname(__file__), "..", "data")
    home = os.path.join(os.path.expanduser("~"), ".medaka_tpu", "data")
    for base in (data_dir, home):
        for suffix in ("_model_pt.tar.gz", ".tar.gz", ""):
            candidate = os.path.join(base, model + suffix)
            if os.path.exists(candidate):
                return candidate
    if model in getattr(options, "known_models", ()):
        try:
            return download_model(model, fetcher=fetcher)
        except DownloadError as e:
            raise FileNotFoundError(str(e)) from e
    raise FileNotFoundError(
        "Could not resolve model {!r}; provide a model file path.".format(
            model))


# register concrete models on import
from medaka_tpu.models.gru import GRUModel  # noqa: E402,F401
from medaka_tpu.models.latent_space_lstm import (  # noqa: E402,F401
    LatentSpaceLSTM)
from medaka_tpu.models.majority import MajorityVoteModel  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Model auto-selection from basecaller metadata
# (reference ``medaka/models.py:142-256``)
# ---------------------------------------------------------------------------


def _models_from_bam(fname):
    from medaka_tpu.io.bam import BamReader
    models = set()
    with BamReader(fname) as reader:
        for line in reader.header_text.splitlines():
            if not line.startswith("@RG"):
                continue
            for field in line.split("\t"):
                if field.startswith("DS:"):
                    ds = field[3:]
                    if "basecall_model=" in ds:
                        models.add(
                            ds.split("basecall_model=")[1].split()[0])
    return models


def _models_from_fastq(fname):
    import itertools as _it

    from medaka_tpu import options
    from medaka_tpu.io.fastx import read_fastx
    # longest names first: versioned entries must beat their
    # unversioned prefixes (e.g. ..._hac@v4.2.0 over ..._hac)
    known = sorted(options.basecaller_models, key=len, reverse=True)
    models = set()
    for rec in _it.islice(read_fastx(fname), 100):
        comment = rec.comment or ""
        # format 1: basecall_model_version_id=<model>
        if "basecall_model_version_id=" in comment:
            models.add(
                comment.split("basecall_model_version_id=")[1].split()[0])
            continue
        # format 2: RG:Z:<runid>_<model>_<barcode...>; search known names
        for name in known:
            if name in comment:
                models.add(name)
                break
    return models


def model_from_basecaller(fname, variant=False, bacteria=False):
    """Pick the right model from a basecaller output file.

    BAM/CRAM: the ``DS`` subfield of @RG headers is scanned for
    ``basecall_model=``; FASTQ: the first 100 record comments. The
    basecaller name is looked up in the catalogue
    (:mod:`medaka_tpu.options`).
    """
    from medaka_tpu import common, options
    logger = common.get_named_logger("MdlInspect")
    try:
        models = _models_from_bam(fname)
    except Exception:
        models = set()
    if not models:
        try:
            models = _models_from_fastq(fname)
        except Exception:
            raise IOError(
                "Failed to parse basecaller models from input file.")
    if len(models) != 1:
        raise ValueError(
            "Input file did not contain precisely 1 basecaller model "
            "reference.")
    basecaller = models.pop()
    if basecaller not in options.basecaller_models:
        raise KeyError(
            "Unknown basecaller model. Please provide a model "
            "explicitly using --model.")
    consensus, var = options.basecaller_models[basecaller]
    model = var if variant else consensus
    if model is None:
        raise ValueError(
            "No {} model available for basecaller {}.".format(
                "variant" if variant else "consensus", basecaller))
    if bacteria and not variant:
        if model in options.bact_methyl_compatible_models:
            model = options.bact_methyl_model
        else:
            logger.warning(
                "--bacteria specified but input data was not compatible; "
                "using default model %s.", model)
    return model


# ---------------------------------------------------------------------------
# Export for dorado (reference ``medaka/torch_ext.py:474-533``)
# ---------------------------------------------------------------------------

EXPORT_CONFIG_VERSION = 3


def _toml_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    return '"{}"'.format(str(v).replace('"', '\\"'))


def _toml_dump(doc: Dict, fh, prefix=""):
    scalars = {
        k: v for k, v in doc.items()
        if not isinstance(v, dict) and v is not None}
    tables = {k: v for k, v in doc.items() if isinstance(v, dict)}
    for key, value in scalars.items():
        fh.write("{} = {}\n".format(key, _toml_value(value)))
    for key, value in tables.items():
        name = "{}.{}".format(prefix, key) if prefix else key
        fh.write("\n[{}]\n".format(name))
        _toml_dump(value, fh, name)


def export_model(model_path: str, output: Optional[str] = None,
                 supported_basecallers: Optional[list] = None,
                 force: bool = False) -> str:
    """Export a model as config.toml + weights.pt (dorado polish format).

    Weights are converted back to a torch state dict via the model's
    ``torch_state_from_params`` so the exported archive is loadable by
    the reference/dorado stack.
    """
    import shutil
    import tempfile

    import torch

    if not os.path.exists(model_path):
        raise FileNotFoundError(
            "Model file not found: {}".format(model_path))
    if output is None:
        output = os.path.basename(model_path).replace(
            ".tar.gz", "_export")
    if os.path.exists(output + ".tar.gz") and not force:
        raise FileExistsError(
            "{}.tar.gz exists; pass force=True to overwrite.".format(
                output))
    bundle = load_model(model_path)
    if not hasattr(bundle.model, "torch_state_from_params"):
        raise NotImplementedError(
            "{} cannot be exported to torch format.".format(
                type(bundle.model).__name__))
    config = {
        "config_version": EXPORT_CONFIG_VERSION,
        "model": bundle.model.to_dict(),
        "feature_encoder": bundle.feature_encoder.to_dict()
        if bundle.feature_encoder else {},
        "supported_basecallers": supported_basecallers or [],
        "label_scheme": bundle.label_scheme.to_dict()
        if bundle.label_scheme else {},
    }
    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in bundle.model.torch_state_from_params(
            bundle.params).items()}
    tmpdir = tempfile.mkdtemp()
    try:
        mdir = os.path.join(tmpdir, "model")
        os.makedirs(mdir)
        with open(os.path.join(mdir, "config.toml"), "w") as fh:
            _toml_dump(config, fh)
        torch.save(state, os.path.join(mdir, "weights.pt"))
        out_tar = output + ".tar.gz"
        with tarfile.open(out_tar, "w:gz") as tar:
            tar.add(mdir, arcname="model")
    finally:
        shutil.rmtree(tmpdir)
    return out_tar
