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
from typing import Dict, Optional, Tuple

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


def resolve_model(model: str) -> str:
    """Resolve a model name or path to a loadable file path.

    Unlike the reference there is no model download here (the execution
    environment has no network egress); a model must exist on disk or in the
    package data directory.
    """
    if os.path.exists(model):
        return model
    data_dir = os.path.join(os.path.dirname(__file__), "..", "data")
    for suffix in ("_model_pt.tar.gz", ".tar.gz", ""):
        candidate = os.path.join(data_dir, model + suffix)
        if os.path.exists(candidate):
            return candidate
    home = os.path.join(
        os.path.expanduser("~"), ".medaka_tpu", "data")
    for suffix in ("_model_pt.tar.gz", ".tar.gz", ""):
        candidate = os.path.join(home, model + suffix)
        if os.path.exists(candidate):
            return candidate
    raise FileNotFoundError(
        "Could not resolve model {!r}; provide a model file path.".format(
            model))


# register concrete models on import
from medaka_tpu.models.gru import GRUModel  # noqa: E402,F401
from medaka_tpu.models.latent_space_lstm import (  # noqa: E402,F401
    LatentSpaceLSTM)
from medaka_tpu.models.majority import MajorityVoteModel  # noqa: E402,F401
