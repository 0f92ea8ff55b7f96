"""Interop with reference medaka artifacts (pickled metadata, checkpoints).

Reference medaka serialises feature encoders, label schemes and a model
factory partial with ``pickle`` into HDF5 files and model tarballs
(reference ``medaka/datastore.py:96-99``, ``medaka/torch_ext.py:23-61``).
This module unpickles those objects WITHOUT medaka installed by substituting
stub classes, then maps them onto medaka_tpu equivalents.
"""
from __future__ import annotations

import functools
import inspect
import io
import pickle
import tarfile
import tempfile
from typing import Any, Dict, Optional

from medaka_tpu import common

logger = common.get_named_logger("compat")


class MedakaStub:
    """Placeholder standing in for any pickled medaka object.

    Class-level defaults matter: pickle NEWOBJ constructs instances via
    ``cls.__new__`` without running ``__init__``.
    """

    _medaka_name_ = "unknown"
    _args = ()
    _kwargs: Dict = {}
    _state: Dict = {}

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs
        self._state = {}

    def __setstate__(self, state):
        if isinstance(state, dict):
            self._state = state
        else:
            self._state = {"__state__": state}

    def __call__(self, *args, **kwargs):
        # pickled function stub invoked (e.g. by functools.partial REDUCE)
        call = MedakaStub()
        call._medaka_name_ = self._medaka_name_
        call._args = args
        call._kwargs = kwargs
        return call


_STUB_CACHE: Dict[str, type] = {}


def _stub_class(module: str, name: str) -> type:
    full = "{}.{}".format(module, name)
    if full not in _STUB_CACHE:
        _STUB_CACHE[full] = type(
            name, (MedakaStub,), {"_medaka_name_": full})
    return _STUB_CACHE[full]


class MedakaUnpickler(pickle.Unpickler):
    """Unpickler replacing medaka classes/functions with stubs."""

    def find_class(self, module, name):
        if module == "functools" and name == "partial":
            return functools.partial
        if module.split(".")[0] in ("medaka", "libmedaka"):
            cls = _stub_class(module, name)
            # lowercase names are functions: return a callable capture
            return cls() if name[0].islower() else cls
        return super().find_class(module, name)


def medaka_loads(data: bytes) -> Any:
    """Unpickle reference-medaka-produced bytes into stubs."""
    return MedakaUnpickler(io.BytesIO(data)).load()


def _stub_name(obj) -> Optional[str]:
    if isinstance(obj, MedakaStub):
        return obj._medaka_name_.rsplit(".", 1)[-1]
    return None


def _filter_kwargs(cls, kwargs: Dict) -> Dict:
    params = inspect.signature(cls.__init__).parameters
    return {k: v for k, v in kwargs.items() if k in params}


def convert_feature_encoder(obj):
    """Map a pickled medaka feature encoder (stub) to ours."""
    import medaka_tpu.features as features_mod
    name = _stub_name(obj)
    if name is None:
        return obj
    cls = getattr(features_mod, name, None)
    if cls is None:
        raise ValueError("Unknown feature encoder {!r}".format(name))
    state = dict(obj._state)
    if isinstance(state.get("dtypes"), (list, tuple)):
        state["dtypes"] = tuple(state["dtypes"])
    return cls(**_filter_kwargs(cls, state))


def convert_label_scheme(obj):
    """Map a pickled medaka label scheme (stub) to ours."""
    import medaka_tpu.labels as labels_mod
    name = _stub_name(obj)
    if name is None:
        return obj
    cls = getattr(labels_mod, name, None)
    if cls is None:
        raise ValueError("Unknown label scheme {!r}".format(name))
    return cls(**_filter_kwargs(cls, dict(obj._state)))


def convert_model_function(obj) -> Dict:
    """Map a pickled model factory to a {type, kwargs} model dict.

    Handles both modern ``partial(model_from_dict, {...})`` and legacy
    ``partial(build_model_torch, feature_len, num_classes, ...)`` forms
    (reference ``medaka/models.py:380-436``).
    """
    if isinstance(obj, functools.partial):
        func_name = _stub_name(obj.func) or getattr(
            obj.func, "__name__", "")
        args, kwargs = obj.args, obj.keywords or {}
        if func_name == "model_from_dict":
            return dict(args[0]) if args else dict(kwargs)
        if func_name in ("build_model_torch", "build_model"):
            names = ("feature_len", "num_classes", "gru_size",
                     "classify_activation", "time_steps")
            merged = dict(zip(names, args))
            merged.update(kwargs)
            out = {
                "num_features": merged.get("feature_len", 10),
                "num_classes": merged.get("num_classes", 5)}
            if "gru_size" in merged:
                out["gru_size"] = merged["gru_size"]
            return {"type": "GRUModel", "kwargs": out}
    if isinstance(obj, MedakaStub):
        # a pickled model instance or factory call capture
        name = _stub_name(obj)
        kwargs = dict(obj._kwargs)
        if obj._args and isinstance(obj._args[0], dict):
            return dict(obj._args[0])
        return {"type": name, "kwargs": kwargs}
    if isinstance(obj, dict):
        return obj
    raise ValueError(
        "Cannot interpret model function {!r}".format(obj))


def convert_meta(key: str, obj):
    """Convert one pickled HDF5 ``meta/`` item onto medaka_tpu objects.

    Reference stores {feature_encoder, label_scheme, model_function}
    (``medaka/datastore.py:96-99``).
    """
    if key == "feature_encoder":
        return convert_feature_encoder(obj)
    if key == "label_scheme":
        return convert_label_scheme(obj)
    if key == "model_function":
        return convert_model_function(obj)
    return obj


def load_medaka_tgz(path: str):
    """Import a reference medaka model tarball into a `ModelBundle`.

    The archive holds ``model/weights.pt`` (a torch state dict) and
    ``model/meta.pkl`` ({model_function, label_scheme, feature_encoder}).
    """
    import torch

    from medaka_tpu.models import ModelBundle, model_from_dict

    with tarfile.open(path, "r:*") as tar:
        names = [m.name for m in tar.getmembers()]
        weights_name = next(
            (n for n in names if n.endswith("weights.pt")), None)
        meta_name = next((n for n in names if n.endswith(".pkl")), None)
        if weights_name is None or meta_name is None:
            raise ValueError(
                "{} does not look like a medaka model tarball "
                "(members: {})".format(path, names))
        meta = medaka_loads(tar.extractfile(meta_name).read())
        with tempfile.NamedTemporaryFile(suffix=".pt") as tmp:
            tmp.write(tar.extractfile(weights_name).read())
            tmp.flush()
            state = torch.load(
                tmp.name, map_location="cpu", weights_only=True)

    model_dict = convert_model_function(meta["model_function"])
    model = model_from_dict(model_dict)
    params = model.params_from_torch_state(state)
    fenc = convert_feature_encoder(meta.get("feature_encoder"))
    lsch = convert_label_scheme(meta.get("label_scheme"))
    return ModelBundle(model, params, fenc, lsch)
